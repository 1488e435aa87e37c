"""Accrued-reward replay buffer for ESR algorithms (EUPG).

TPU-native counterpart of reference common/accrued_reward_buffer.py:7-117:
each transition additionally stores the reward *accrued so far in the episode*
(the ESR conditioning variable) and the in-episode timestep.  EUPG is
on-policy and clears the buffer each episode (reference eupg.py:360-363);
``reset`` here just zeroes the size, so the arrays are reused in place.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class AccruedTransition(NamedTuple):
    obs: jnp.ndarray
    accrued_reward: jnp.ndarray  # (d,) reward accrued before this step
    action: jnp.ndarray
    reward: jnp.ndarray  # (d,)
    next_obs: jnp.ndarray
    terminated: jnp.ndarray
    timestep: jnp.ndarray  # int32 in-episode t


class AccruedRewardReplayBuffer(NamedTuple):
    data: AccruedTransition
    ptr: jnp.ndarray
    size: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.data.obs.shape[0]

    @staticmethod
    def create(
        capacity: int,
        obs_dim: int,
        reward_dim: int,
        action_shape: tuple = (),
        action_dtype=jnp.int32,
    ) -> "AccruedRewardReplayBuffer":
        data = AccruedTransition(
            obs=jnp.zeros((capacity, obs_dim)),
            accrued_reward=jnp.zeros((capacity, reward_dim)),
            action=jnp.zeros((capacity, *action_shape), dtype=action_dtype),
            reward=jnp.zeros((capacity, reward_dim)),
            next_obs=jnp.zeros((capacity, obs_dim)),
            terminated=jnp.zeros((capacity,)),
            timestep=jnp.zeros((capacity,), dtype=jnp.int32),
        )
        return AccruedRewardReplayBuffer(data=data, ptr=jnp.int32(0), size=jnp.int32(0))

    def add_batch(self, batch: AccruedTransition) -> "AccruedRewardReplayBuffer":
        n = batch.obs.shape[0]
        idx = (self.ptr + jnp.arange(n)) % self.capacity
        data = jax.tree.map(lambda buf, new: buf.at[idx].set(new), self.data, batch)
        return AccruedRewardReplayBuffer(
            data=data, ptr=(self.ptr + n) % self.capacity, size=jnp.minimum(self.size + n, self.capacity)
        )

    def sample(self, key: jax.Array, batch_size: int) -> AccruedTransition:
        idx = jax.random.randint(key, (batch_size,), 0, jnp.maximum(self.size, 1))
        return jax.tree.map(lambda x: x[idx], self.data)

    def get_all(self) -> tuple[AccruedTransition, jnp.ndarray]:
        """All rows + validity mask (fixed shape; reference get_all_data :95-110)."""
        valid = jnp.arange(self.capacity) < self.size
        return self.data, valid

    def reset(self) -> "AccruedRewardReplayBuffer":
        """On-policy cleanup between episodes (reference cleanup :112-117)."""
        return self._replace(ptr=jnp.int32(0), size=jnp.int32(0))
