"""Pallas TPU kernel: tiled Pareto non-dominated mask for large fronts.

The jnp implementation (core/pareto.py) materializes the full (N, N)
comparison working set in HBM and OOMs between N=65536 and N=131072 on one
chip; this kernel tiles the pairwise comparison over (TILE, TILE) blocks
held in VMEM and accumulates only the per-row "is dominated" reduction, so
HBM traffic is O(N*d) instead of O(N^2) — N=131072 runs in 0.50s.  Below
the memory cliff XLA's fused mask is at parity speed-wise (0.72-1.06x
measured), so the auto dispatch (PALLAS_MIN_N) reserves the kernel for the
archive scales where the jnp path cannot run at all.

Grid: (N/TILE, N/TILE) over (row tiles, column tiles) — the column sweep is
a sequential grid dimension OR-accumulating into the revisited output block
(Mosaic here legalizes neither scf.for nor bool minor-dim inserts, and a
(TILE, TILE, d) broadcast pads d onto the 128-lane axis; hence per-objective
(TILE, TILE) compares unrolled over d, int32 reductions, and a pre-transposed
rows operand).  Verified bitwise against the jnp mask in COMPILED mode on the
real chip (bench.py pareto-kernel line).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128


def _nd_kernel(points_row_ref, points_col_ref, valid_col_ref, out_ref, *, dedup: bool):
    """Grid (row_tiles, col_tiles): dominated_i |= any_j-in-col-tile (valid_j
    & j dom i).  The column axis is a GRID dimension, not an in-kernel loop
    (Mosaic on this TPU does not legalize scf.for): TPU grids iterate
    sequentially, so OR-accumulating into the revisited out block is safe —
    initialize at col tile 0, accumulate after.

    With ``dedup``, an earlier valid exact duplicate also counts as dominating
    (core.pareto.non_dominated_mask(keep_duplicates=False) semantics)."""
    rows_t = points_row_ref[:]  # (d, TILE) — transposed row tile
    cols = points_col_ref[:]  # (TILE, d)
    vcols = valid_col_ref[:]  # (TILE, 1) float 0/1
    t = pl.program_id(1)
    d = cols.shape[1]
    # per-objective (TILE, TILE) comparisons, unrolled over the small static
    # d: broadcasting the d axis as the minor (lane) dim pads it to 128 and
    # blows VMEM (27 MB at TILE=128); (TILE, TILE) masks are 2 KB each.
    # ge[j, i] = all_k cols[j,k] >= rows[i,k]; gt[j, i] = any_k >
    ge = gt = eq = None
    for k in range(d):
        c_k = cols[:, k : k + 1]  # (TILE, 1)
        r_k = rows_t[k : k + 1, :]  # (1, TILE)
        ge = (c_k >= r_k) if ge is None else (ge & (c_k >= r_k))
        gt = (c_k > r_k) if gt is None else (gt | (c_k > r_k))
        if dedup:
            eq = (c_k == r_k) if eq is None else (eq & (c_k == r_k))
    dom = ge & gt
    if dedup:
        col_idx = t * TILE + jax.lax.broadcasted_iota(jnp.int32, (TILE, 1), 0)
        row_idx = pl.program_id(0) * TILE + jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1)
        dom = dom | (eq & (col_idx < row_idx))
    dom = dom & (vcols > 0.5)
    # int32 reduction: Mosaic only supports minor-dim insertion for 32-bit
    # types, so the per-row OR-reduction is a max over int32
    dominated_tile = jnp.max(dom.astype(jnp.int32), axis=0)[:, None]  # (TILE, 1)

    @pl.when(t == 0)
    def _init():
        out_ref[:, :] = dominated_tile

    @pl.when(t != 0)
    def _acc():
        out_ref[:, :] = jnp.maximum(out_ref[:, :], dominated_tile)


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
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        grid=(n_pad // TILE, n_pad // TILE),  # (row tiles, col tiles)
        in_specs=[
            # rows arrive pre-transposed (d, N) so the kernel reads (1, TILE)
            # lane-major slices per objective
            pl.BlockSpec((d, TILE), lambda i, t: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, d), lambda i, t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i, t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, 1), lambda i, t: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pts.T, pts, vcol)

    mask = (dominated[:n, 0] == 0) & valid
    return mask


# Measured on the real chip (r4): XLA's fused jnp mask is at parity with the
# kernel up to N=65536 (0.72-1.06x) but OOMs between 65536 and 131072 rows;
# the tiled kernel handles N=131072 in 0.50s (spot-checked correct).  So the
# kernel is the MEMORY-cliff path, not a speed win: dispatch to it only where
# the jnp mask would materialize an infeasible (N, N) working set.
PALLAS_MIN_N = 100_000


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
