"""Water Reservoir (dam control) — pure-JAX continuous MO env.

Companion of MO-Gymnasium's ``water-reservoir-v0`` (the Pianosi /
Castelletti dam problem): a single dam with stochastic inflows; the action
releases water each day. Two objectives (the upstream default):

    r = [ -flooding excess   (storage above the flooding threshold),
          -demand deficit    (release short of the downstream water demand) ]

Dynamics: s' = s + inflow - release, inflow ~ N(40, 10) truncated at 0,
release physically clipped to [0, s + inflow]. Constants (demand 50,
flooding threshold 100, 100-day episodes, uniform initial storage) follow
the published problem family; exact upstream normalization constants are
not reproduced (documented deviation).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .base import Box, MOEnv, StepOut

_DEMAND = 50.0
_FLOOD = 100.0
_INFLOW_MEAN = 40.0
_INFLOW_STD = 10.0
_S_MAX = 200.0


class DamState(NamedTuple):
    storage: jnp.ndarray
    t: jnp.ndarray


class WaterReservoir(MOEnv):
    """Action in [-1, 1] (the convention every continuous agent here emits),
    mapped internally to a release fraction in [0, 1] of _S_MAX per day."""

    reward_dim = 2
    name = "water-reservoir-v0"

    def __init__(self, max_episode_steps: int = 100):
        self.max_episode_steps = max_episode_steps
        self.observation_space = Box(low=(0.0,), high=(2.0 * _S_MAX,))
        self.action_space = Box(low=(-1.0,), high=(1.0,))

    def _obs(self, s: DamState) -> jnp.ndarray:
        return jnp.stack([s.storage]).astype(jnp.float32)

    def reset(self, key: jax.Array):
        s0 = jax.random.uniform(key, (), minval=0.0, maxval=_S_MAX * 0.8)
        s = DamState(s0, jnp.int32(0))
        return s, self._obs(s)

    def step(self, state: DamState, action: jnp.ndarray, key: jax.Array) -> StepOut:
        a = jnp.clip(jnp.asarray(action, dtype=jnp.float32).reshape(()), -1.0, 1.0)
        release_frac = (a + 1.0) / 2.0
        inflow = jnp.maximum(
            _INFLOW_MEAN + _INFLOW_STD * jax.random.normal(key, ()), 0.0
        )
        available = state.storage + inflow
        release = jnp.clip(release_frac * _S_MAX, 0.0, available)
        storage = jnp.clip(available - release, 0.0, _S_MAX * 2.0)
        reward = jnp.stack(
            [
                -jnp.maximum(storage - _FLOOD, 0.0),
                -jnp.maximum(_DEMAND - release, 0.0),
            ]
        ).astype(jnp.float32)
        t = state.t + 1
        new = DamState(storage, t)
        return StepOut(new, self._obs(new), reward, jnp.bool_(False), t >= self.max_episode_steps)
