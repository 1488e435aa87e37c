"""Pareto archives: host archive of (individual, evaluation) + device front.

Reference: ``ParetoArchive`` (morl_baselines/common/pareto.py:149-175) keeps a
python list of policies with their evaluations and re-prunes on every insert.
We keep that host-side object (policies are arbitrary pytrees/objects) and add
a fully device-resident fixed-capacity front (values + valid mask) whose
``add`` is a pure jittable function, so eval pipelines can maintain the front
without leaving the device.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from .pareto import non_dominated_mask


class DeviceParetoFront(NamedTuple):
    """Fixed-capacity Pareto front living on device.

    values: (N, d) float32; valid: (N,) bool.
    """

    values: jnp.ndarray
    valid: jnp.ndarray

    @staticmethod
    def create(capacity: int, num_objectives: int) -> "DeviceParetoFront":
        return DeviceParetoFront(
            values=jnp.zeros((capacity, num_objectives), dtype=jnp.float32),
            valid=jnp.zeros((capacity,), dtype=bool),
        )

    def add(self, candidates: jnp.ndarray, cand_valid: jnp.ndarray | None = None) -> "DeviceParetoFront":
        """Insert a batch of candidate points and re-prune; pure function.

        Keeps at most ``capacity`` non-dominated points.  When the combined
        non-dominated set exceeds capacity, the points with the largest
        crowding (sum of per-objective rank spread) are preferred — a static
        top-k, no data-dependent shapes.
        """
        cand = jnp.asarray(candidates, dtype=jnp.float32)
        if cand.ndim == 1:
            cand = cand[None, :]
        m = cand.shape[0]
        if cand_valid is None:
            cand_valid = jnp.ones((m,), dtype=bool)
        all_vals = jnp.concatenate([self.values, cand], axis=0)
        all_valid = jnp.concatenate([self.valid, cand_valid], axis=0)
        # large-front path: tiled Pallas prune on TPU (ops/pareto_kernel.py),
        # jnp mask otherwise
        from ..ops.pareto_kernel import non_dominated_mask_auto

        nd = non_dominated_mask_auto(all_vals, all_valid, keep_duplicates=False)
        # score: non-dominated first, break ties by diversity (negated crowding not
        # needed at reference scale; use scalar sum as a stable secondary key)
        score = nd.astype(jnp.float32) * 1e6 + jnp.where(nd, jnp.sum(all_vals, axis=-1), 0.0)
        cap = self.values.shape[0]
        _, top = lax.top_k(score, cap)
        return DeviceParetoFront(values=all_vals[top], valid=nd[top])


class ParetoArchive:
    """Host archive of (individual, evaluation) pairs, re-pruned on insert.

    Mirrors reference pareto.py:149-175 (`ParetoArchive.add`): the archive
    always holds exactly the non-dominated evaluations seen so far, with their
    associated individuals (policy snapshots, params pytrees, ...).
    """

    def __init__(self):
        self.individuals: list[Any] = []
        self.evaluations: list[np.ndarray] = []

    def add(self, individual: Any, evaluation: np.ndarray) -> None:
        self.individuals.append(individual)
        self.evaluations.append(np.asarray(evaluation, dtype=np.float64))
        vals = np.stack(self.evaluations)
        mask = np.asarray(non_dominated_mask(jnp.asarray(vals), keep_duplicates=False))
        # keep_duplicates=False keeps one copy of equal evaluations, like the
        # reference's list-compaction
        self.individuals = [ind for ind, keep in zip(self.individuals, mask) if keep]
        self.evaluations = [ev for ev, keep in zip(self.evaluations, mask) if keep]

    @property
    def front(self) -> np.ndarray:
        if not self.evaluations:
            return np.zeros((0, 0))
        return np.stack(self.evaluations)

    def __len__(self) -> int:
        return len(self.individuals)
