"""Device-resident prioritized replay — masked-cumsum sampling on the VPU.

TPU-native re-design of the reference's level-array SumTree PER
(reference morl_baselines/common/prioritized_buffer.py:12-226).  A SumTree
exists to make CPU sampling O(log n); on TPU a single fused
``cumsum + searchsorted`` over the priority vector is a bandwidth-bound
vector op that the VPU does in microseconds for 1e6 entries, needs no
tree maintenance, is trivially batched, and keeps everything jittable.
Priority updates are plain scatters.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .buffer import Transition


class PrioritizedReplayBuffer(NamedTuple):
    data: Transition
    priorities: jnp.ndarray  # (capacity,) >= 0; 0 for empty rows
    max_priority: jnp.ndarray  # running max for new inserts (reference :150)
    ptr: jnp.ndarray
    size: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.data.obs.shape[0]

    @staticmethod
    def create(
        capacity: int,
        obs_dim: int,
        action_shape: tuple = (),
        reward_dim: int = 2,
        action_dtype=jnp.int32,
        obs_dtype=jnp.float32,
    ) -> "PrioritizedReplayBuffer":
        data = Transition(
            obs=jnp.zeros((capacity, obs_dim), dtype=obs_dtype),
            action=jnp.zeros((capacity, *action_shape), dtype=action_dtype),
            reward=jnp.zeros((capacity, reward_dim), dtype=jnp.float32),
            next_obs=jnp.zeros((capacity, obs_dim), dtype=obs_dtype),
            terminated=jnp.zeros((capacity,), dtype=jnp.float32),
        )
        return PrioritizedReplayBuffer(
            data=data,
            priorities=jnp.zeros((capacity,), dtype=jnp.float32),
            max_priority=jnp.float32(1.0),
            ptr=jnp.int32(0),
            size=jnp.int32(0),
        )

    def add_batch(self, batch: Transition, priority: jnp.ndarray | None = None) -> "PrioritizedReplayBuffer":
        """Insert N transitions with priority (default: current max, reference :147-156)."""
        n = batch.obs.shape[0]
        idx = (self.ptr + jnp.arange(n)) % self.capacity
        data = jax.tree.map(lambda buf, new: buf.at[idx].set(new), self.data, batch)
        p = jnp.broadcast_to(self.max_priority if priority is None else priority, (n,))
        return PrioritizedReplayBuffer(
            data=data,
            priorities=self.priorities.at[idx].set(p),
            max_priority=self.max_priority,
            ptr=(self.ptr + n) % self.capacity,
            size=jnp.minimum(self.size + n, self.capacity),
        )

    def add(self, tr: Transition, priority=None) -> "PrioritizedReplayBuffer":
        return self.add_batch(jax.tree.map(lambda x: jnp.asarray(x)[None], tr), priority)

    def sample(self, key: jax.Array, batch_size: int):
        """Proportional sampling: returns (batch, idx, importance_weights-unnormalized probs).

        Mirrors SumTree.sample's proportional scheme (reference :30-54) via
        inverse-CDF on the cumulative priorities.
        """
        cdf = jnp.cumsum(self.priorities)
        total = cdf[-1]
        u = jax.random.uniform(key, (batch_size,)) * jnp.maximum(total, 1e-12)
        idx = jnp.clip(jnp.searchsorted(cdf, u, side="right"), 0, self.capacity - 1)
        batch = jax.tree.map(lambda x: x[idx], self.data)
        probs = self.priorities[idx] / jnp.maximum(total, 1e-12)
        return batch, idx, probs

    def sample_obs(self, key: jax.Array, batch_size: int) -> jnp.ndarray:
        """Uniform observation sample (Dyna rollout starts, reference buffer.py:118-124)."""
        idx = jax.random.randint(key, (batch_size,), 0, jnp.maximum(self.size, 1))
        return self.data.obs[idx]

    def update_priorities(self, idx: jnp.ndarray, priorities: jnp.ndarray) -> "PrioritizedReplayBuffer":
        """Scatter new priorities, tracking the running max (reference :197-205)."""
        p = jnp.maximum(priorities, 1e-12)
        return self._replace(
            priorities=self.priorities.at[idx].set(p),
            max_priority=jnp.maximum(self.max_priority, jnp.max(p)),
        )

    def reset_priorities(self, value: float = 1.0) -> "PrioritizedReplayBuffer":
        """Uniformize priorities of valid rows (GPI-PD on new weight, reference gpi_pd.py:619-660)."""
        valid = jnp.arange(self.capacity) < self.size
        return self._replace(
            priorities=jnp.where(valid, value, 0.0), max_priority=jnp.float32(value)
        )
