"""Schedules and small math utilities (jnp, usable inside jit).

Counterparts of reference common/utils.py:10-49 (linearly_decaying_value,
unique_tol) and the per-algorithm epsilon/homotopy schedules.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def linearly_decaying_value(
    initial: float, decay_period: float, step, warmup_steps: float, final: float
):
    """DQN-style linear decay (reference utils.py:10-33), traced-step safe."""
    step = jnp.asarray(step, dtype=jnp.float32)
    steps_left = decay_period + warmup_steps - step
    bonus = (initial - final) * steps_left / decay_period
    return jnp.clip(bonus + final, min(initial, final), max(initial, final))


def unique_tol(arrays: list[np.ndarray], tol: float = 1e-4) -> list[np.ndarray]:
    """Dedup a list of vectors up to tolerance (reference utils.py:35-47)."""
    out: list[np.ndarray] = []
    for a in arrays:
        if not any(np.allclose(a, b, atol=tol) for b in out):
            out.append(np.asarray(a))
    return out


def nearest_neighbors(weights: np.ndarray, k: int) -> np.ndarray:
    """Index matrix of k nearest weight vectors (reference utils.py:71-107, MORL/D)."""
    w = np.asarray(weights)
    d = np.linalg.norm(w[:, None, :] - w[None, :, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    return np.argsort(d, axis=-1)[:, :k]
