"""Batched Pareto-dominance operations, jit/vmap friendly.

TPU-native re-design of the reference's numpy Pareto utilities
(reference: morl_baselines/common/pareto.py:10-175).  All predicates are
expressed as fixed-shape masked array ops so they compose with ``jax.jit``,
``jax.vmap`` and run on the VPU; there is no data-dependent control flow.

Convention: **maximization** everywhere (as in the reference).  Dynamic-size
point sets are represented as a fixed-capacity ``(N, d)`` array plus a boolean
``valid`` mask of shape ``(N,)``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def pareto_dominates(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """True iff ``a`` Pareto-dominates ``b`` (>= everywhere, > somewhere).

    Mirrors reference pareto.py:10-21, but as a jnp predicate usable under jit.
    Broadcasts over leading dims.
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    return jnp.all(a >= b, axis=-1) & jnp.any(a > b, axis=-1)


def strict_pareto_dominates(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """True iff ``a`` > ``b`` in every objective (reference pareto.py:29-31)."""
    return jnp.all(jnp.asarray(a) > jnp.asarray(b), axis=-1)


def batched_pareto_dominates(a: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Vector of ``pareto_dominates(a, p)`` for each row p of ``points``."""
    return pareto_dominates(a[None, :], points)


def non_dominated_mask(
    points: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    keep_duplicates: bool = True,
) -> jnp.ndarray:
    """Boolean mask of Pareto-non-dominated rows of ``points``.

    Fully vectorized O(N^2 d) pairwise comparison — the same algorithmic shape
    as the reference's vectorized mask (pareto.py:34-57) but on-device and
    mask-aware so it can run inside jit with a fixed capacity N.

    Args:
        points: (N, d) candidate values (maximization).
        valid: optional (N,) bool; invalid rows are treated as absent and are
            always reported dominated.
        keep_duplicates: if True, exact duplicates of a non-dominated point are
            all kept; if False only the first occurrence is kept.

    Returns:
        (N,) bool mask, True where the row is valid and non-dominated.
    """
    points = jnp.asarray(points)
    n = points.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    # dom[i, j] = point i dominates point j
    ge = jnp.all(points[:, None, :] >= points[None, :, :], axis=-1)
    gt = jnp.any(points[:, None, :] > points[None, :, :], axis=-1)
    dom = ge & gt & valid[:, None]
    dominated = jnp.any(dom, axis=0)
    mask = valid & ~dominated
    if not keep_duplicates:
        eq = jnp.all(points[:, None, :] == points[None, :, :], axis=-1)
        eq = eq & valid[:, None] & valid[None, :]
        idx = jnp.arange(n)
        # first valid occurrence of each duplicate group survives
        first = jnp.argmax(eq & valid[:, None], axis=0)  # lowest i with eq[i,j]
        mask = mask & (first == idx)
    return mask


def non_dominated_count(points: jnp.ndarray, valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Number of non-dominated rows (cardinality, device scalar)."""
    return jnp.sum(non_dominated_mask(points, valid))


def lorenz_vector(points: jnp.ndarray, lmbda: float = 1.0) -> jnp.ndarray:
    """Lorenz transform: cumulative sum of ascending-sorted objectives.

    x Lorenz-dominates y iff lorenz(x) Pareto-dominates lorenz(y) (LCN,
    reference multi_policy/lcn/lcn.py:26-45).  ``lmbda`` < 1 interpolates
    between plain objectives and the Lorenz vector (lambda-Lorenz dominance
    for adjustable fairness, reference lcn.py:226-237).
    """
    p = jnp.asarray(points)
    lz = jnp.cumsum(jnp.sort(p, axis=-1), axis=-1)
    return lmbda * lz + (1.0 - lmbda) * p


def lorenz_dominates(a: jnp.ndarray, b: jnp.ndarray, lmbda: float = 1.0) -> jnp.ndarray:
    return pareto_dominates(lorenz_vector(a, lmbda), lorenz_vector(b, lmbda))


# ---------------------------------------------------------------------------
# Host-side helpers (numpy) — for outer loops that genuinely need compaction.
# ---------------------------------------------------------------------------


def filter_pareto_dominated(points: np.ndarray, keep_duplicates: bool = True) -> np.ndarray:
    """Host-side compacting filter (reference pareto.py:60-73 semantics).

    Large archives with duplicates kept go through the native O(n^2 d) kernel
    (native/morl_native.cpp) when built; otherwise the jnp mask.
    """
    points = np.asarray(points)
    if len(points) == 0:
        return points
    if keep_duplicates and len(points) >= 256:
        from ..utils import native

        mask = native.pareto_mask(np.asarray(points, dtype=np.float64))
        if mask is not None:
            return points[mask]
    mask = np.asarray(non_dominated_mask(jnp.asarray(points), keep_duplicates=keep_duplicates))
    return points[mask]


def filter_convex_dominated(points: np.ndarray) -> np.ndarray:
    """Keep only points on the convex coverage set (CCS).

    Reference pareto.py:76-93 uses scipy ConvexHull; here we use the direct
    LP-free criterion: a point v is convex-dominated iff some convex
    combination of the others weakly dominates it.  For the small fronts MORL
    produces we solve it with scipy's linprog per point.
    """
    from scipy.optimize import linprog

    points = np.asarray(points, dtype=np.float64)
    nd = filter_pareto_dominated(points, keep_duplicates=False)
    n, d = nd.shape
    if n <= 2:
        return nd
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        others = nd[np.arange(n) != i]
        # exists alpha >= 0, sum alpha = 1, others^T alpha >= nd[i] ?
        # feasibility LP: minimize 0 s.t. -others^T alpha <= -nd[i], 1^T alpha = 1
        res = linprog(
            c=np.zeros(n - 1),
            A_ub=-others.T,
            b_ub=-nd[i] - 1e-9,
            A_eq=np.ones((1, n - 1)),
            b_eq=np.array([1.0]),
            bounds=[(0, 1)] * (n - 1),
            method="highs",
        )
        if res.status == 0:  # feasible -> convex-dominated
            keep[i] = False
    return nd[keep]


def get_non_dominated_inds(points: np.ndarray) -> np.ndarray:
    """Indices of non-dominated rows, host-side (reference pareto.py:128-146)."""
    points = np.asarray(points)
    mask = np.asarray(non_dominated_mask(jnp.asarray(points)))
    return np.flatnonzero(mask)
