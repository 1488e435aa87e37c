"""IPRO — Iterated Pareto Referent Optimisation (outer loop + 2D/nD variants).

TPU-native re-design of reference multi_policy/ipro/outer_loop.py:29-461,
ipro_2d.py:24-269, ipro.py:23-333 and box.py:6-133 (Röpke et al.):

- AASF utility u(v) = min((v - referent) / (ideal - nadir)) * scale + aug *
  mean(...) (reference outer_loop.py:47-51) — here a pure jnp closure, so the
  inner oracle (our jitted NLMOPPO) gets exact ∂u/∂v by jax.grad.
- Init phase trains per-objective linear scalarizations to estimate the
  extrema -> nadir/ideal with offset (reference ipro_2d.py init_phase).
- 2-D: a queue of boxes ordered by volume; training against the largest
  box's nadir as referent; a point strictly dominating the referent splits
  the box in two, accumulating dominated/discarded hypervolume; coverage =
  (dominated + discarded) / total; stop at 1 - coverage <= tolerance
  (reference ipro_2d.py:149-267).
- n-D: same scheme with the standard d-way box split (the reference keeps
  lower/upper point sets; the box decomposition realizes the same referent
  iteration for d > 2).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.pareto import filter_pareto_dominated, strict_pareto_dominates
from ..envs.base import MOEnv
from .base import MOAgentBase
from .nlmoppo import NLMOPPO, NLMOPPOConfig


class Box:
    """Axis-aligned box [nadir, ideal] (reference box.py:6-133)."""

    def __init__(self, nadir: np.ndarray, ideal: np.ndarray):
        self.nadir = np.asarray(nadir, dtype=np.float64)
        self.ideal = np.asarray(ideal, dtype=np.float64)

    @property
    def volume(self) -> float:
        return float(np.prod(np.maximum(self.ideal - self.nadir, 0.0)))

    @property
    def max_dist(self) -> float:
        return float(np.max(np.maximum(self.ideal - self.nadir, 0.0)))

    def __repr__(self):
        return f"Box({self.nadir}, {self.ideal})"


def make_aasf(referent, nadir, ideal, aug: float = 0.1, scale: float = 100.0):
    """AASF closure over jnp (reference outer_loop.py:47-51)."""
    referent = jnp.asarray(referent, dtype=jnp.float32)
    pos = jnp.asarray(ideal, dtype=jnp.float32) - jnp.asarray(nadir, dtype=jnp.float32)

    def u(v):
        frac = scale * (v - referent) / pos
        return jnp.min(frac, axis=-1) + aug * jnp.mean(frac, axis=-1)

    return u


def make_linear_u(weights):
    w = jnp.asarray(weights, dtype=jnp.float32)

    def u(v):
        return jnp.sum(v * w, axis=-1)

    return u


@dataclass
class IPROConfig:
    offset: float = 1.0
    tolerance: float = 1e-2
    max_iterations: Optional[int] = 20
    aug: float = 0.1
    scale: float = 100.0
    iter_total_timesteps: int = 50_000
    reset_agent: bool = False
    ppo: NLMOPPOConfig = field(default_factory=NLMOPPOConfig)
    seed: int = 0


class IPRO(MOAgentBase):
    """Referent-decomposition outer loop; works for any d >= 2 via box splits."""

    def __init__(self, env: MOEnv, config: IPROConfig = IPROConfig(), log: bool = False):
        super().__init__(env, config, log=log)
        self.cfg = config
        self.agent = NLMOPPO(env, config.ppo)
        self.pf: List[np.ndarray] = []
        self.box_queue: List[Box] = []
        self.total_hv = 0.0
        self.dominated_hv = 0.0
        self.discarded_hv = 0.0
        self.coverage = 0.0

    # ------------------------------------------------------------- box algebra

    def _split_box(self, box: Box, point: np.ndarray) -> List[Box]:
        """Split box at an interior point (2-way for d=2, d-way otherwise)."""
        d = len(point)
        p = np.clip(point, box.nadir, box.ideal)
        self.dominated_hv += Box(box.nadir, p).volume
        self.discarded_hv += Box(p, box.ideal).volume
        boxes = []
        if d == 2:
            boxes.append(Box(np.array([box.nadir[0], p[1]]), np.array([p[0], box.ideal[1]])))
            boxes.append(Box(np.array([p[0], box.nadir[1]]), np.array([box.ideal[0], p[1]])))
        else:
            # standard staircase split: for each dim k, the slab where coords
            # 0..k-1 are below p and coord k above p
            for k in range(d):
                nad = box.nadir.copy()
                ide = box.ideal.copy()
                nad[k] = p[k]
                for j in range(k):
                    ide[j] = p[j]
                boxes.append(Box(nad, ide))
        return [b for b in boxes if b.volume > self.cfg.tolerance and np.all(b.ideal > b.nadir)]

    def _push_boxes(self, boxes: List[Box]) -> None:
        self.box_queue.extend(boxes)
        self.box_queue.sort(key=lambda b: b.volume)

    # ------------------------------------------------------------- init phase

    def init_phase(self, state):
        """Train per-objective linear scalarizations for the extrema."""
        cfg = self.cfg
        extrema = []
        for k in range(self.reward_dim):
            u = make_linear_u(np.eye(self.reward_dim)[k])
            state, point = self.agent.train(cfg.iter_total_timesteps, u, state=state)
            extrema.append(point)
            self.pf.append(point)
        extrema = np.asarray(extrema)
        self.nadir = extrema.min(axis=0) - cfg.offset
        self.ideal = extrema.max(axis=0) + cfg.offset
        self.pf = list(filter_pareto_dominated(np.asarray(self.pf)))
        bounding = Box(self.nadir, self.ideal)
        self.total_hv = bounding.volume
        self._push_boxes([bounding])
        return state

    # ------------------------------------------------------------------ solve

    def train(self, total_timesteps: int | None = None, eval_env=None, ref_point=None, known_pareto_front=None):
        """Run IPRO; returns the Pareto front as a list of vectors."""
        cfg = self.cfg
        state = self.agent.init_state(jax.random.key(cfg.seed))
        state = self.init_phase(state)
        iteration = 0
        max_iter = cfg.max_iterations or np.inf
        while self.box_queue and iteration < max_iter and (1.0 - self.coverage) > cfg.tolerance:
            box = self.box_queue.pop()  # largest volume
            referent = box.nadir
            u = make_aasf(referent, self.nadir, self.ideal, cfg.aug, cfg.scale)
            if cfg.reset_agent:
                state = self.agent.init_state(jax.random.key(cfg.seed + iteration + 1))
            state, point = self.agent.train(cfg.iter_total_timesteps, u, state=state)
            if bool(strict_pareto_dominates(jnp.asarray(point), jnp.asarray(referent))):
                # replay mechanism: the new point may also dominate other open
                # boxes' nadirs — split those too (reference outer_loop.py:313-356)
                self._push_boxes(self._split_box(box, point))
                self.pf.append(point)
                remaining = []
                for ob in self.box_queue:
                    if bool(strict_pareto_dominates(jnp.asarray(point), jnp.asarray(ob.nadir))) and np.all(
                        point < ob.ideal
                    ):
                        remaining.extend(self._split_box(ob, point))
                    else:
                        remaining.append(ob)
                self.box_queue = remaining
                self.box_queue.sort(key=lambda b: b.volume)
            else:
                # failed subproblem: the box volume is written off as discarded
                self.discarded_hv += box.volume
            self.coverage = (self.dominated_hv + self.discarded_hv) / max(self.total_hv, 1e-12)
            iteration += 1
            self.pf = list(filter_pareto_dominated(np.asarray(self.pf)))
            self.logger.log(
                {
                    "outer/coverage": self.coverage,
                    "outer/pf_size": len(self.pf),
                    "outer/open_boxes": len(self.box_queue),
                },
                iteration,
            )
        self._state = state
        return self.pf


class IPRO2D(IPRO):
    """Bi-objective specialization (reference ipro_2d.py) — same engine, d=2 split."""

    def __init__(self, env: MOEnv, config: IPROConfig = IPROConfig(), log: bool = False):
        assert env.reward_dim == 2, "IPRO2D requires exactly 2 objectives"
        super().__init__(env, config, log=log)
