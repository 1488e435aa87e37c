"""Pallas TPU kernel: tiled Pareto non-dominated mask for large fronts.

The jnp implementation (core/pareto.py) materializes the full (N, N)
comparison matrix in HBM.  For archive-scale fronts (N in the thousands —
e.g. merged multi-host eval returns before pruning) this kernel tiles the
pairwise comparison over (TILE, TILE) blocks held in VMEM and accumulates
only the per-row "is dominated" reduction, so HBM traffic is O(N*d) instead
of O(N^2): the comparison matrix never leaves on-chip memory.

Grid: (N/TILE,) over candidate rows; each program streams all column tiles
of the points array through VMEM and reduces.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128


def _nd_kernel(points_row_ref, points_all_ref, valid_all_ref, out_ref, *, dedup: bool):
    """For each row i in this tile: dominated_i = any_j (valid_j & j dom i).

    With ``dedup``, an earlier valid exact duplicate also counts as dominating
    (core.pareto.non_dominated_mask(keep_duplicates=False) semantics)."""
    rows = points_row_ref[:]  # (TILE, d)
    n_all = points_all_ref.shape[0]
    num_tiles = n_all // TILE
    i0 = pl.program_id(0) * TILE

    def body(t, dominated):
        cols = points_all_ref[pl.ds(t * TILE, TILE), :]  # (TILE, d)
        vcols = valid_all_ref[pl.ds(t * TILE, TILE), :]  # (TILE, 1) float 0/1
        # ge[j, i] = all_d cols[j] >= rows[i]; gt[j, i] = any_d cols[j] > rows[i]
        ge = jnp.all(cols[:, None, :] >= rows[None, :, :], axis=-1)
        gt = jnp.any(cols[:, None, :] > rows[None, :, :], axis=-1)
        dom = ge & gt
        if dedup:
            eq = jnp.all(cols[:, None, :] == rows[None, :, :], axis=-1)
            col_idx = t * TILE + jax.lax.broadcasted_iota(jnp.int32, (TILE, 1), 0)
            row_idx = i0 + jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1)
            dom = dom | (eq & (col_idx < row_idx))
        dom = dom & (vcols > 0.5)
        return dominated | jnp.any(dom, axis=0)

    dominated = jax.lax.fori_loop(0, num_tiles, body, jnp.zeros((TILE,), dtype=jnp.bool_))
    out_ref[:, 0] = dominated


@partial(jax.jit, static_argnames=("keep_duplicates", "interpret"))
def non_dominated_mask_pallas(
    points: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    keep_duplicates: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas-tiled version of core.pareto.non_dominated_mask (maximization).

    Pads N up to a TILE multiple; invalid/padded rows are reported dominated.
    Use for large fronts; falls back to the jnp path for small inputs at the
    call site (ops.pareto_kernel.non_dominated_mask_auto).
    """
    n, d = points.shape
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    n_pad = ((n + TILE - 1) // TILE) * TILE
    pts = jnp.full((n_pad, d), -jnp.inf, dtype=jnp.float32).at[:n].set(points.astype(jnp.float32))
    # padded/invalid rows sit at -inf so they never dominate anyone
    pts = jnp.where(jnp.pad(valid, (0, n_pad - n))[:, None], pts, -jnp.inf)
    vcol = jnp.pad(valid.astype(jnp.float32), (0, n_pad - n))[:, None]

    dominated = pl.pallas_call(
        partial(_nd_kernel, dedup=not keep_duplicates),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.bool_),
        grid=(n_pad // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pts, pts, vcol)

    mask = ~dominated[:n, 0] & valid
    return mask


# Pallas pays off once the (N, N) comparison matrix stops fitting in cache-
# friendly HBM traffic; below this the jnp mask's single fused kernel wins.
PALLAS_MIN_N = 512


def non_dominated_mask_auto(
    points: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    keep_duplicates: bool = True,
) -> jnp.ndarray:
    """Dispatch: Pallas kernel on TPU for big N, jnp mask otherwise.

    This is the package's large-front pruning path: DeviceParetoFront.add and
    evaluation.device_front_metrics route through it, so archive-scale fronts
    (merged multi-host eval returns) prune tiled in VMEM."""
    from ..core.pareto import non_dominated_mask

    n = points.shape[0]
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    if on_tpu and n >= PALLAS_MIN_N:
        return non_dominated_mask_pallas(points, valid, keep_duplicates)
    return non_dominated_mask(points, valid, keep_duplicates)
