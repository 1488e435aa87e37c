"""Weight-vector (preference simplex) generation.

TPU-native counterpart of reference morl_baselines/common/weights.py:10-58.
Random sampling uses ``jax.random`` so it can run inside jitted training steps
(e.g. a fresh weight per episode per vmapped env).  The deterministic
equally-spaced set is init-time-only in every algorithm, so it is computed
once on host (the reference uses pymoo's Riesz s-energy there; we use the
standard Das–Dennis simplex lattice, which is the deterministic construction
that s-energy approximates).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def random_weights(
    key: jax.Array,
    dim: int,
    n: int | None = None,
    dist: str = "dirichlet",
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Sample weight vectors on the positive simplex (reference weights.py:10-35).

    dist="dirichlet": flat Dirichlet (uniform on the simplex).
    dist="gaussian": |N(0,1)| normalized to sum 1 (the reference's alternative).
    """
    shape = (dim,) if n is None else (n, dim)
    if dist == "dirichlet":
        w = jax.random.dirichlet(key, jnp.ones((dim,), dtype=jnp.float32), shape[:-1])
    elif dist == "gaussian":
        g = jnp.abs(jax.random.normal(key, shape))
        w = g / jnp.sum(g, axis=-1, keepdims=True)
    else:
        raise ValueError(f"unknown dist {dist!r}")
    return w.astype(dtype)


@lru_cache(maxsize=32)
def _das_dennis(dim: int, n_partitions: int) -> np.ndarray:
    """All compositions of n_partitions into dim non-negative parts / n_partitions."""
    if dim == 1:
        return np.array([[1.0]])
    out = []

    def rec(prefix, remaining, slots):
        if slots == 1:
            out.append(prefix + [remaining])
            return
        for k in range(remaining + 1):
            rec(prefix + [k], remaining - k, slots - 1)

    rec([], n_partitions, dim)
    return np.asarray(out, dtype=np.float64) / float(n_partitions)


@lru_cache(maxsize=32)
def equally_spaced_weights(dim: int, n: int, seed: int = 42) -> np.ndarray:
    """~n equally spaced weights on the simplex (reference weights.py:38-49).

    Deterministic Das–Dennis lattice with the smallest partition count giving
    at least ``n`` points, subsampled to exactly ``n`` by a farthest-point
    sweep (keeps the extrema, preserves spread).  Host-side + lru_cached, as
    in the reference.
    """
    p = 1
    while len(_das_dennis(dim, p)) < n:
        p += 1
    pts = _das_dennis(dim, p)
    if len(pts) == n:
        return pts
    # farthest-point subsample, seeded start at the first extremum
    rng = np.random.default_rng(seed)
    del rng  # deterministic selection; seed kept for API stability
    chosen = [0]
    d2 = np.sum((pts - pts[0]) ** 2, axis=-1)
    for _ in range(n - 1):
        nxt = int(np.argmax(d2))
        chosen.append(nxt)
        d2 = np.minimum(d2, np.sum((pts - pts[nxt]) ** 2, axis=-1))
    return pts[np.sort(np.asarray(chosen))]


def extrema_weights(dim: int) -> np.ndarray:
    """The dim one-hot corner weights (reference weights.py:52-58)."""
    return np.eye(dim, dtype=np.float64)
