"""Fishwood — pure-JAX ESR micro-env (2 objectives: fish, wood).

Behavioral counterpart of MO-Gymnasium's ``fishwood-v0`` (Roijers et al.,
2018), the reference's ESR test bed (reference tests/test_algos.py:69-89,
examples/eupg_fishwood.py).  The agent is either at the river (0) or in the
woods (1); the action chooses where to be this step; at the river it catches a
fish w.p. ``fish_proba`` -> reward (1, 0); in the woods it gathers wood w.p.
``wood_proba`` -> (0, 1).  Episodes last ``max_episode_steps`` (200).  The
canonical ESR utility is min(fish, wood // 2) applied to the *episode return*.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .base import Box, Discrete, MOEnv, StepOut


class FishwoodState(NamedTuple):
    location: jnp.ndarray  # int32: 0 river, 1 woods
    t: jnp.ndarray


class Fishwood(MOEnv):
    reward_dim = 2
    name = "fishwood-v0"

    def __init__(self, fish_proba: float = 0.25, wood_proba: float = 0.65, max_episode_steps: int = 200):
        self.fish_proba = fish_proba
        self.wood_proba = wood_proba
        self.max_episode_steps = max_episode_steps
        self.observation_space = Box(low=(0.0,), high=(1.0,))
        self.action_space = Discrete(2)

    num_states = 2

    def state_index(self, obs: jnp.ndarray) -> jnp.ndarray:
        return obs[..., 0].astype(jnp.int32)

    def _obs(self, state: FishwoodState) -> jnp.ndarray:
        return state.location.astype(jnp.float32)[None]

    def reset(self, key: jax.Array):
        state = FishwoodState(jnp.int32(1), jnp.int32(0))
        return state, self._obs(state)

    def step(self, state: FishwoodState, action: jnp.ndarray, key: jax.Array) -> StepOut:
        loc = jnp.asarray(action, dtype=jnp.int32)  # act = destination
        u = jax.random.uniform(key)
        p = jnp.where(loc == 0, self.fish_proba, self.wood_proba)
        success = (u < p).astype(jnp.float32)
        reward = jnp.stack([jnp.where(loc == 0, success, 0.0), jnp.where(loc == 1, success, 0.0)])
        t = state.t + 1
        new_state = FishwoodState(loc, t)
        return StepOut(
            new_state,
            self._obs(new_state),
            reward,
            jnp.bool_(False),
            t >= self.max_episode_steps,
        )


def fishwood_utility(vec_return: jnp.ndarray) -> jnp.ndarray:
    """ESR utility min(fish, wood // 2) (reference examples/eupg_fishwood.py:15-22)."""
    return jnp.minimum(vec_return[..., 0], jnp.floor_divide(vec_return[..., 1], 2.0))
