"""Profiling — jax.profiler traces + host-side phase timing.

The reference has no profiler hooks; it logs only steps-per-second counters
to wandb (reference mo_ppo.py:608-613 and friends). Here profiling is a
first-class subsystem (SURVEY §5): ``trace`` wraps ``jax.profiler`` so any
training segment can be captured for xprof/tensorboard, and ``PhaseTimer``
aggregates wall-clock per learner phase (collect / update / eval / outer)
between jitted segments.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator


@contextlib.contextmanager
def trace(logdir: str, *, host_tracer_level: int = 2) -> Iterator[None]:
    """Capture a jax.profiler trace (view with xprof / tensorboard).

    >>> with trace("/tmp/jax-trace"):
    ...     state = agent.train_segment(state, 100)
    ...     jax.block_until_ready(state.obs)
    """
    import jax

    opts = jax.profiler.ProfileOptions()
    opts.host_tracer_level = host_tracer_level
    jax.profiler.start_trace(logdir, profiler_options=opts)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Aggregate wall-clock per named phase; report once per log interval.

    Phases should bracket *completed* device work — call ``jax.block_until_ready``
    inside the phase (or time whole dispatch+wait segments) for honest numbers.
    """

    def __init__(self) -> None:
        self._total: Dict[str, float] = defaultdict(float)
        self._count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._total[name] += time.perf_counter() - t0
            self._count[name] += 1

    def metrics(self, prefix: str = "profile/") -> Dict[str, float]:
        """{prefix}{name}_s totals (wandb/jsonl-ready); resets the timer."""
        out = {}
        for name, total in self._total.items():
            out[f"{prefix}{name}_s"] = total
            out[f"{prefix}{name}_calls"] = self._count[name]
        self._total.clear()
        self._count.clear()
        return out
