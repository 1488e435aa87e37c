"""MO Mountain Car (discrete, 3 objectives) and continuous (2 objectives).

Behavioral counterparts of MO-Gymnasium's ``mo-mountaincar-v0`` (objectives:
time penalty, reverse penalty, forward penalty) and
``mo-mountaincarcontinuous-v0`` (time penalty, fuel penalty), the reference's
continuous-control test env (reference tests/test_algos.py:228-232 uses
mo-mountaincarcontinuous-v0 for GPI-PD continuous).  Classic Moore dynamics,
expressed as branch-free jnp so thousands of cars roll under vmap.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .base import Box, Discrete, MOEnv, StepOut


class MCState(NamedTuple):
    position: jnp.ndarray
    velocity: jnp.ndarray
    t: jnp.ndarray


class MOMountainCar(MOEnv):
    """Discrete 3-action mountain car; rewards (time, reverse, forward) all in {-1, 0}."""

    reward_dim = 3
    name = "mo-mountaincar-v0"

    def __init__(self, max_episode_steps: int = 200):
        self.max_episode_steps = max_episode_steps
        self.observation_space = Box(low=(-1.2, -0.07), high=(0.6, 0.07))
        self.action_space = Discrete(3)

    def _obs(self, s: MCState) -> jnp.ndarray:
        return jnp.stack([s.position, s.velocity]).astype(jnp.float32)

    def reset(self, key: jax.Array):
        pos = jax.random.uniform(key, (), minval=-0.6, maxval=-0.4)
        s = MCState(pos, jnp.float32(0.0), jnp.int32(0))
        return s, self._obs(s)

    def step(self, state: MCState, action: jnp.ndarray, key: jax.Array) -> StepOut:
        action = jnp.asarray(action, dtype=jnp.int32)
        force = (action.astype(jnp.float32) - 1.0) * 0.001
        velocity = jnp.clip(state.velocity + force + jnp.cos(3.0 * state.position) * (-0.0025), -0.07, 0.07)
        position = jnp.clip(state.position + velocity, -1.2, 0.6)
        velocity = jnp.where((position <= -1.2) & (velocity < 0), 0.0, velocity)
        terminated = (position >= 0.5) & (velocity >= 0.0)
        reward = jnp.stack(
            [
                jnp.float32(-1.0),  # time penalty
                jnp.where(action == 0, -1.0, 0.0),  # reverse penalty
                jnp.where(action == 2, -1.0, 0.0),  # forward penalty
            ]
        )
        t = state.t + 1
        new_state = MCState(position, velocity, t)
        return StepOut(new_state, self._obs(new_state), reward, terminated, t >= self.max_episode_steps)


class MOMountainCarContinuous(MOEnv):
    """Continuous-force mountain car; rewards (time penalty, fuel penalty)."""

    reward_dim = 2
    name = "mo-mountaincarcontinuous-v0"

    def __init__(self, max_episode_steps: int = 999):
        self.max_episode_steps = max_episode_steps
        self.observation_space = Box(low=(-1.2, -0.07), high=(0.6, 0.07))
        self.action_space = Box(low=(-1.0,), high=(1.0,))

    def _obs(self, s: MCState) -> jnp.ndarray:
        return jnp.stack([s.position, s.velocity]).astype(jnp.float32)

    def reset(self, key: jax.Array):
        pos = jax.random.uniform(key, (), minval=-0.6, maxval=-0.4)
        s = MCState(pos, jnp.float32(0.0), jnp.int32(0))
        return s, self._obs(s)

    def step(self, state: MCState, action: jnp.ndarray, key: jax.Array) -> StepOut:
        force = jnp.clip(jnp.asarray(action, dtype=jnp.float32).reshape(()), -1.0, 1.0)
        velocity = jnp.clip(
            state.velocity + force * 0.0015 + jnp.cos(3.0 * state.position) * (-0.0025), -0.07, 0.07
        )
        position = jnp.clip(state.position + velocity, -1.2, 0.6)
        velocity = jnp.where((position <= -1.2) & (velocity < 0), 0.0, velocity)
        terminated = (position >= 0.45) & (velocity >= 0.0)
        reward = jnp.stack(
            [
                jnp.where(terminated, 100.0, -1.0),  # time/goal objective
                -0.1 * force * force,  # fuel penalty
            ]
        )
        t = state.t + 1
        new_state = MCState(position, velocity, t)
        return StepOut(new_state, self._obs(new_state), reward, terminated, t >= self.max_episode_steps)
