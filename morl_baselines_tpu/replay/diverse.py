"""DiverseMemory — multi-priority replay with a crowding-retained secondary store.

TPU-native counterpart of reference common/diverse_buffer.py:11-605 (DynMORL's
DiverseMemory).  The reference keeps several SumTrees over one data array plus
a secondary "diverse" memory whose eviction survivor set is chosen by
crowding distance over per-trace (episode) values.  Note: the reference
implements it but no algorithm in the snapshot consumes it (SURVEY §2.1);
it is provided for inventory completeness.

Functional design:
- one data ring (pytree of arrays) shared by T priority vectors (the
  reference's multiple trees, :11-198) — sampling per tree is the same fused
  cumsum/searchsorted inverse-CDF as replay/prioritized.py;
- a fixed-capacity secondary store: when a main-ring row is about to be
  overwritten, it is promoted into the secondary store iff its trace value
  has higher crowding distance than the current least-crowded member
  (reference move_to_sec/crowd_dist, :490-605).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .buffer import Transition
from .episodic import crowding_distance


class DiverseMemory(NamedTuple):
    data: Transition  # (capacity, ...)
    priorities: jnp.ndarray  # (num_trees, capacity)
    trace_value: jnp.ndarray  # (capacity, d) per-row trace signature (e.g. episode return)
    sec_data: Transition  # (sec_capacity, ...)
    sec_value: jnp.ndarray  # (sec_capacity, d)
    sec_valid: jnp.ndarray  # (sec_capacity,)
    max_priority: jnp.ndarray
    ptr: jnp.ndarray
    size: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.data.obs.shape[0]

    @staticmethod
    def create(
        capacity: int,
        sec_capacity: int,
        obs_dim: int,
        reward_dim: int,
        num_trees: int = 2,
        action_shape: tuple = (),
        action_dtype=jnp.int32,
    ) -> "DiverseMemory":
        def mk(cap):
            return Transition(
                obs=jnp.zeros((cap, obs_dim)),
                action=jnp.zeros((cap, *action_shape), dtype=action_dtype),
                reward=jnp.zeros((cap, reward_dim)),
                next_obs=jnp.zeros((cap, obs_dim)),
                terminated=jnp.zeros((cap,)),
            )

        return DiverseMemory(
            data=mk(capacity),
            priorities=jnp.zeros((num_trees, capacity)),
            trace_value=jnp.zeros((capacity, reward_dim)),
            sec_data=mk(sec_capacity),
            sec_value=jnp.zeros((sec_capacity, reward_dim)),
            sec_valid=jnp.zeros((sec_capacity,), dtype=bool),
            max_priority=jnp.float32(1.0),
            ptr=jnp.int32(0),
            size=jnp.int32(0),
        )

    def add_batch(self, batch: Transition, trace_value: jnp.ndarray) -> "DiverseMemory":
        """Insert N transitions; rows being overwritten may be promoted to the
        secondary store if their trace is more crowding-diverse."""
        n = batch.obs.shape[0]
        cap = self.capacity
        idx = (self.ptr + jnp.arange(n)) % cap
        mem = self
        # promotion: consider the first overwritten row only per batch (cheap,
        # matches the reference's per-insert single eviction)
        full = self.size >= cap
        evict_row = jax.tree.map(lambda x: x[idx[0]], self.data)
        evict_val = self.trace_value[idx[0]]
        sec_vals = jnp.where(mem.sec_valid[:, None], mem.sec_value, -jnp.inf)
        all_vals = jnp.concatenate([sec_vals, evict_val[None]], axis=0)
        all_valid = jnp.concatenate([mem.sec_valid, jnp.ones((1,), dtype=bool)])
        crowd = crowding_distance(all_vals, all_valid)
        worst = jnp.argmin(jnp.where(all_valid, crowd, jnp.inf))
        # promote iff buffer full and the evicted row is not itself the least diverse
        promote = full & (worst != all_vals.shape[0] - 1)
        slot = jnp.minimum(worst, mem.sec_valid.shape[0] - 1)
        sec_data = jax.tree.map(
            lambda s, r: jnp.where(promote, s.at[slot].set(r), s), mem.sec_data, evict_row
        )
        sec_value = jnp.where(promote, mem.sec_value.at[slot].set(evict_val), mem.sec_value)
        sec_valid = jnp.where(promote, mem.sec_valid.at[slot].set(True), mem.sec_valid)

        data = jax.tree.map(lambda buf, new: buf.at[idx].set(new), self.data, batch)
        prio = self.priorities.at[:, idx].set(self.max_priority)
        tv = self.trace_value.at[idx].set(trace_value)
        return mem._replace(
            data=data,
            priorities=prio,
            trace_value=tv,
            sec_data=sec_data,
            sec_value=sec_value,
            sec_valid=sec_valid,
            ptr=(self.ptr + n) % cap,
            size=jnp.minimum(self.size + n, cap),
        )

    def sample(self, key: jax.Array, batch_size: int, tree: int = 0):
        """Proportional sample from priority tree ``tree`` (reference :243-293)."""
        p = self.priorities[tree]
        cdf = jnp.cumsum(p)
        total = jnp.maximum(cdf[-1], 1e-12)
        u = jax.random.uniform(key, (batch_size,)) * total
        idx = jnp.clip(jnp.searchsorted(cdf, u, side="right"), 0, self.capacity - 1)
        return jax.tree.map(lambda x: x[idx], self.data), idx, p[idx] / total

    def update_priorities(self, idx: jnp.ndarray, priorities: jnp.ndarray, tree: int = 0):
        p = jnp.maximum(priorities, 1e-12)
        return self._replace(
            priorities=self.priorities.at[tree, idx].set(p),
            max_priority=jnp.maximum(self.max_priority, jnp.max(p)),
        )

    def sample_secondary(self, key: jax.Array, batch_size: int):
        """Uniform sample over the retained diverse rows."""
        n_valid = jnp.maximum(jnp.sum(self.sec_valid), 1)
        order = jnp.argsort(~self.sec_valid)  # valid rows first
        idx = order[jax.random.randint(key, (batch_size,), 0, n_valid)]
        return jax.tree.map(lambda x: x[idx], self.sec_data), idx
