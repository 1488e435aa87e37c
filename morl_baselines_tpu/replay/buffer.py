"""Device-resident uniform replay buffer — a pure-functional pytree.

TPU-native replacement for the reference's host numpy ring buffer
(reference morl_baselines/common/buffer.py:50-135).  The reference keeps the
buffer in numpy and pays a host<->device copy every update (SURVEY §3.2);
here the buffer is a pytree of preallocated jnp arrays that lives in HBM, and
``add``/``sample`` are jittable pure functions, so the whole
act -> store -> sample -> learn loop stays on device inside one ``lax.scan``.

Supports batched adds (N transitions per env-step from the vectorized env)
via scatter at ring positions, and CER ("use latest transition in every
sampled batch", reference buffer.py:103-106) as an option on ``sample``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Transition(NamedTuple):
    obs: jnp.ndarray
    action: jnp.ndarray
    reward: jnp.ndarray  # (d,) vector reward
    next_obs: jnp.ndarray
    terminated: jnp.ndarray  # bool / float


class ReplayBuffer(NamedTuple):
    data: Transition  # arrays of shape (capacity, ...)
    ptr: jnp.ndarray  # int32 next write position
    size: jnp.ndarray  # int32 number of valid rows

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
    ) -> "ReplayBuffer":
        data = Transition(
            obs=jnp.zeros((capacity, obs_dim), dtype=obs_dtype),
            action=jnp.zeros((capacity, *action_shape), dtype=action_dtype),
            reward=jnp.zeros((capacity, reward_dim), dtype=jnp.float32),
            next_obs=jnp.zeros((capacity, obs_dim), dtype=obs_dtype),
            terminated=jnp.zeros((capacity,), dtype=jnp.float32),
        )
        return ReplayBuffer(data=data, ptr=jnp.int32(0), size=jnp.int32(0))

    def add_batch(self, batch: Transition) -> "ReplayBuffer":
        """Insert N transitions at the ring pointer (N = leading dim)."""
        n = batch.obs.shape[0]
        cap = self.capacity
        idx = (self.ptr + jnp.arange(n)) % cap
        data = jax.tree.map(lambda buf, new: buf.at[idx].set(new), self.data, batch)
        return ReplayBuffer(
            data=data,
            ptr=(self.ptr + n) % cap,
            size=jnp.minimum(self.size + n, cap),
        )

    def add(self, tr: Transition) -> "ReplayBuffer":
        return self.add_batch(jax.tree.map(lambda x: jnp.asarray(x)[None], tr))

    def sample(self, key: jax.Array, batch_size: int, use_cer: bool = False) -> Transition:
        """Uniform sample of batch_size transitions (with replacement).

        use_cer: overwrite index 0 with the most recent transition
        (reference buffer.py:103-106).
        """
        idx = jax.random.randint(key, (batch_size,), 0, jnp.maximum(self.size, 1))
        if use_cer:
            last = (self.ptr - 1) % self.capacity
            idx = idx.at[0].set(last)
        return jax.tree.map(lambda x: x[idx], self.data)

    def sample_obs(self, key: jax.Array, batch_size: int) -> jnp.ndarray:
        """Sample observations only (reference buffer.py:118-124, used by Dyna)."""
        idx = jax.random.randint(key, (batch_size,), 0, jnp.maximum(self.size, 1))
        return self.data.obs[idx]

    def get_all_data(self, max_samples: int | None = None):
        """Host-side: valid rows as numpy (reference buffer.py:126-135)."""
        import numpy as np

        size = int(self.size)
        rows = jax.tree.map(lambda x: np.asarray(x[:size]), self.data)
        if max_samples is not None and size > max_samples:
            sel = np.random.default_rng(0).choice(size, max_samples, replace=False)
            rows = jax.tree.map(lambda x: x[sel], rows)
        return rows
