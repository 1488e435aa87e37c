"""MORL performance indicators — batched XLA ops + exact host fallback.

Reference: morl_baselines/common/performance_indicators.py:15-128 (which
delegates HV/IGD to pymoo).  Here:

- ``hypervolume``: exact 2-D device kernel (sort-and-sweep under jit), exact
  d<=8 host WFG (numpy, our own implementation) for periodic logging, and a
  jittable Monte-Carlo estimator for in-graph use at d>2.
- ``expected_utility`` (EUM), ``cardinality``, ``maximum_utility_loss`` (MUL),
  ``igd``, ``sparsity``: direct jnp reductions over (front, weights) — these
  were host numpy loops in the reference and become single fused XLA ops here.

Maximization convention throughout; dynamic fronts are (N, d) + valid mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .pareto import non_dominated_mask


# ---------------------------------------------------------------------------
# Hypervolume
# ---------------------------------------------------------------------------


def hypervolume_2d(
    front: jnp.ndarray, ref_point: jnp.ndarray, valid: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Exact 2-objective hypervolume under jit.

    Clips points to the ref box, collapses dominated/invalid points onto the
    ref point (zero contribution), sorts by the first objective, and sums the
    staircase area.  O(N log N), fully on-device.
    """
    front = jnp.asarray(front, dtype=jnp.float32)
    ref = jnp.asarray(ref_point, dtype=jnp.float32)
    n = front.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    nd = non_dominated_mask(front, valid)
    pts = jnp.where(nd[:, None], jnp.maximum(front, ref), ref)
    order = jnp.argsort(pts[:, 0])
    x = pts[order, 0]
    y = pts[order, 1]
    # Non-dominated points sorted by x ascending have y descending, and every
    # collapsed point sits at ref (x[0] chain start).  Guard duplicates in x by
    # taking the running-max of y from the right for the height of each strip.
    y_rightmax = jax.lax.cummax(y[::-1])[::-1]
    x_prev = jnp.concatenate([ref[0][None], x[:-1]])
    area = (x - x_prev) * (y_rightmax - ref[1])
    return jnp.sum(jnp.maximum(area, 0.0))


def hypervolume_3d(
    front: jnp.ndarray, ref_point: jnp.ndarray, valid: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Exact 3-objective hypervolume under jit.

    Slab sweep over the third objective: sort points by obj-2 descending; the
    slab between consecutive z-values contributes (z_i - z_next) times the 2-D
    hypervolume of the points at or above that z (prefix of the sorted order).
    O(N^2 log N) as N parallel 2-D staircases — exact and cheap for the small
    in-graph fronts (PQL action sets, reference pql.py:122-154 scores HV at
    any d via pymoo on host).
    """
    front = jnp.asarray(front, dtype=jnp.float32)
    ref = jnp.asarray(ref_point, dtype=jnp.float32)
    n = front.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    # collapse invalid points onto ref: zero volume, sorted last
    pts = jnp.where(valid[:, None], jnp.maximum(front, ref), ref)
    order = jnp.argsort(-pts[:, 2])
    pts = pts[order]
    z = pts[:, 2]
    z_next = jnp.concatenate([z[1:], ref[2][None]])
    prefix = jnp.arange(n)[None, :] <= jnp.arange(n)[:, None]  # (i, j): j in prefix of i
    hv2 = jax.vmap(lambda m: hypervolume_2d(pts[:, :2], ref[:2], m))(prefix)
    return jnp.sum(jnp.maximum(z - z_next, 0.0) * hv2)


def hypervolume_small_exact(
    front: jnp.ndarray, ref_point: jnp.ndarray, valid: jnp.ndarray | None = None
) -> jnp.ndarray:
    """EXACT hypervolume for ANY number of objectives at small N, jittable.

    Inclusion–exclusion over the union of boxes [ref, p_i]:
        HV = Σ_{∅≠S⊆points} (−1)^{|S|+1} · vol([ref, min_{i∈S} p_i])
    as one dense (2^N, N) subset-mask computation — 2^N·N·d elementwise ops
    on the VPU, no recursion, no data-dependent shapes.  For N ≤ 16 (PQL's
    capacity-bounded per-(s,a) Q-sets) this is exact at any d where the
    reference calls pymoo's host HV per action (reference pql.py:122-154).
    Invalid points collapse onto the ref (empty box ⇒ zero contribution in
    every subset containing them — handled by forcing them out of the min).
    """
    front = jnp.asarray(front, dtype=jnp.float32)
    ref = jnp.asarray(ref_point, dtype=jnp.float32)
    n = front.shape[0]
    assert n <= 20, "inclusion-exclusion HV is for small capacity-bounded sets"
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    pts = jnp.where(valid[:, None], jnp.maximum(front, ref), ref)
    subsets = jnp.arange(1, 2**n, dtype=jnp.uint32)
    member = (subsets[:, None] >> jnp.arange(n, dtype=jnp.uint32)[None, :]) & 1  # (2^n-1, n)
    member = member.astype(bool)
    # min over selected points per dim; non-members at +inf
    sel = jnp.where(member[:, :, None], pts[None, :, :], jnp.inf)
    mins = jnp.min(sel, axis=1)  # (2^n-1, d)
    vols = jnp.prod(jnp.maximum(mins - ref[None, :], 0.0), axis=-1)
    sign = jnp.where(jnp.sum(member, axis=1) % 2 == 1, 1.0, -1.0)
    return jnp.sum(sign * vols)


def hypervolume_mc(
    front: jnp.ndarray,
    ref_point: jnp.ndarray,
    key: jax.Array,
    valid: jnp.ndarray | None = None,
    n_samples: int = 16384,
) -> jnp.ndarray:
    """Monte-Carlo hypervolume estimate for any d, jittable.

    Samples uniformly in the bounding box [ref, max(front)] and measures the
    dominated fraction.  Use for in-graph HV at d>2 (e.g. PQL action scoring);
    exact logging goes through ``hypervolume`` on host.
    """
    front = jnp.asarray(front, dtype=jnp.float32)
    ref = jnp.asarray(ref_point, dtype=jnp.float32)
    n = front.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    pts = jnp.where(valid[:, None], jnp.maximum(front, ref), ref)
    hi = jnp.max(pts, axis=0)
    box = jnp.prod(jnp.maximum(hi - ref, 0.0))
    u = jax.random.uniform(key, (n_samples, front.shape[-1]))
    samples = ref + u * (hi - ref)
    # sample s is covered iff some valid point p >= s
    covered = jnp.any(jnp.all(pts[None, :, :] >= samples[:, None, :], axis=-1) & valid[None, :], axis=-1)
    return box * jnp.mean(covered.astype(jnp.float32))


def _hv_wfg(points: np.ndarray, ref: np.ndarray) -> float:
    """Exact hypervolume, host numpy, WFG exclusive-volume recursion.

    Our own implementation (the reference outsources this to pymoo,
    performance_indicators.py:15-26).  Maximization: volume of the union of
    boxes [ref, p].  Fine for fronts up to a few hundred points, d <= ~7.
    """
    pts = np.asarray(points, dtype=np.float64)
    pts = np.maximum(pts, ref)
    # drop points that add no volume
    pts = pts[np.all(pts > ref, axis=-1)]
    if len(pts) == 0:
        return 0.0
    # sort by first objective descending helps the limit-prune
    pts = pts[np.argsort(-pts[:, 0])]

    def prune(p: np.ndarray) -> np.ndarray:
        if len(p) <= 1:
            return p
        keep = np.ones(len(p), dtype=bool)
        for i in range(len(p)):
            if not keep[i]:
                continue
            dom = np.all(p >= p[i], axis=-1) & np.any(p > p[i], axis=-1)
            dom[~keep] = False
            if dom.any():
                keep[i] = False
        return p[keep]

    def hv(p: np.ndarray) -> float:
        if len(p) == 0:
            return 0.0
        if len(p) == 1:
            return float(np.prod(p[0] - ref))
        if p.shape[1] == 2:
            # exact 2-D staircase
            q = p[np.argsort(-p[:, 0])]
            total, ymax = 0.0, ref[1]
            for x, y in q:
                if y > ymax:
                    total += (x - ref[0]) * (y - ymax)
                    ymax = y
            return float(total)
        total = 0.0
        for i in range(len(p)):
            vol = float(np.prod(p[i] - ref))
            rest = np.minimum(p[i + 1 :], p[i])
            rest = rest[np.all(rest > ref, axis=-1)]
            total += vol - hv(prune(rest))
        return total

    return hv(prune(pts))


def hypervolume(front, ref_point, valid=None) -> float:
    """Exact hypervolume (host).  Drop-in for reference performance_indicators.py:15.

    Accepts numpy or jax arrays; applies the valid mask; dispatches to the
    native C++ WFG kernel (native/morl_native.cpp) when built, else the numpy
    WFG recursion.
    """
    front = np.asarray(front, dtype=np.float64)
    ref = np.asarray(ref_point, dtype=np.float64)
    if valid is not None:
        front = front[np.asarray(valid)]
    if len(front) == 0:
        return 0.0
    from ..utils import native

    out = native.hv_exact(front, ref)
    if out is not None:
        return out
    return _hv_wfg(front, ref)


# ---------------------------------------------------------------------------
# Utility-based indicators — pure jnp
# ---------------------------------------------------------------------------


def expected_utility(
    front: jnp.ndarray, weights: jnp.ndarray, valid: jnp.ndarray | None = None
) -> jnp.ndarray:
    """EUM: mean over weights of max over front of w·v (reference :71-91)."""
    front = jnp.asarray(front, dtype=jnp.float32)
    weights = jnp.asarray(weights, dtype=jnp.float32)
    scal = weights @ front.T  # (W, N)
    if valid is not None:
        scal = jnp.where(valid[None, :], scal, -jnp.inf)
    return jnp.mean(jnp.max(scal, axis=-1))


def maximum_utility_loss(
    front: jnp.ndarray,
    reference_front: jnp.ndarray,
    weights: jnp.ndarray,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """MUL: max over weights of (best ref-front utility − best front utility).

    Reference performance_indicators.py:108-128.
    """
    front = jnp.asarray(front, dtype=jnp.float32)
    ref_front = jnp.asarray(reference_front, dtype=jnp.float32)
    weights = jnp.asarray(weights, dtype=jnp.float32)
    best = jnp.max(weights @ ref_front.T, axis=-1)
    scal = weights @ front.T
    if valid is not None:
        scal = jnp.where(valid[None, :], scal, -jnp.inf)
    got = jnp.max(scal, axis=-1)
    return jnp.max(best - got)


def cardinality(front: jnp.ndarray, valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Number of (valid, non-dominated) points (reference :94-105)."""
    return jnp.sum(non_dominated_mask(jnp.asarray(front), valid)).astype(jnp.float32)


def igd(front: jnp.ndarray, reference_front: jnp.ndarray, valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Inverted generational distance (reference :28-39, pymoo there).

    Mean over reference-front points of the distance to the nearest front
    point — one fused jnp reduction.
    """
    front = jnp.asarray(front, dtype=jnp.float32)
    ref_front = jnp.asarray(reference_front, dtype=jnp.float32)
    d2 = jnp.sum((ref_front[:, None, :] - front[None, :, :]) ** 2, axis=-1)
    if valid is not None:
        d2 = jnp.where(valid[None, :], d2, jnp.inf)
    return jnp.mean(jnp.sqrt(jnp.min(d2, axis=-1)))


def sparsity(front: jnp.ndarray, valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """PGMORL sparsity metric (reference :42-68; deprecated in docs, kept for parity).

    Mean squared gap between consecutive sorted values per objective.
    Invalid rows are excluded by collapsing them onto the per-objective min
    (zero extra gap at the boundary is avoided by dividing by valid count - 1).
    """
    front = jnp.asarray(front, dtype=jnp.float32)
    n = front.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    m = jnp.sum(valid)
    lo = jnp.min(jnp.where(valid[:, None], front, jnp.inf), axis=0)
    pts = jnp.where(valid[:, None], front, lo[None, :])
    srt = jnp.sort(pts, axis=0)
    gaps = jnp.sum((srt[1:] - srt[:-1]) ** 2)
    return jnp.where(m > 1, gaps / (m - 1), 0.0)
