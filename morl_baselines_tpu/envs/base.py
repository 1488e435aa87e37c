"""Functional MO environment API — the TPU-native replacement for MO-Gymnasium.

The reference consumes MO-Gymnasium's stateful gym API (reset/step with a
numpy vector reward, env.unwrapped.reward_space; see reference
common/morl_algorithm.py:248-273).  On TPU the env must live *inside* the
jitted program: every env here is a pure function pair

    reset(key)                 -> (EnvState, obs)
    step(state, action, key)   -> StepOut(state, obs, reward_vec, terminated, truncated)

with fixed-shape jnp state pytrees, so thousands of envs step under
``jax.vmap`` inside ``lax.scan`` with zero host round-trips.  Stochasticity is
explicit through the key.  Auto-reset is a wrapper (see vector.py), matching
gymnasium vector-env semantics.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class Discrete:
    n: int

    @property
    def shape(self):
        return ()

    def sample(self, key: jax.Array) -> jnp.ndarray:
        return jax.random.randint(key, (), 0, self.n)


@dataclass(frozen=True)
class Box:
    low: Tuple[float, ...]
    high: Tuple[float, ...]

    @property
    def shape(self):
        return (len(self.low),)

    def sample(self, key: jax.Array) -> jnp.ndarray:
        lo = jnp.asarray(self.low, dtype=jnp.float32)
        hi = jnp.asarray(self.high, dtype=jnp.float32)
        return jax.random.uniform(key, lo.shape, minval=lo, maxval=hi)


@dataclass(frozen=True)
class ArrayBox:
    """n-D box with scalar bounds (image observations, stacked frames)."""

    low: float
    high: float
    shape: Tuple[int, ...]
    dtype: Any = np.uint8

    def sample(self, key: jax.Array) -> jnp.ndarray:
        u = jax.random.uniform(key, self.shape, minval=self.low, maxval=self.high)
        return u.astype(self.dtype)


class StepOut(NamedTuple):
    state: Any
    obs: jnp.ndarray
    reward: jnp.ndarray  # (reward_dim,) vector reward — the MO extension
    terminated: jnp.ndarray  # bool
    truncated: jnp.ndarray  # bool


class MOEnv:
    """Base class; subclasses define the fields below and pure reset/step."""

    observation_space: Any
    action_space: Any
    reward_dim: int
    max_episode_steps: int | None = None
    name: str = "moenv"

    @property
    def obs_dim(self) -> int:
        return int(np.prod(self.observation_space.shape)) if self.observation_space.shape else 1

    @property
    def num_actions(self) -> int:
        assert isinstance(self.action_space, Discrete)
        return self.action_space.n

    @property
    def action_dim(self) -> int:
        if isinstance(self.action_space, Discrete):
            return 1
        return int(np.prod(self.action_space.shape))

    def reset(self, key: jax.Array):
        raise NotImplementedError

    def step(self, state, action, key: jax.Array) -> StepOut:
        raise NotImplementedError

    # Tabular support: envs with enumerable states expose an integer index so
    # tabular algorithms (MOQL, PQL, MPMOQL) keep their Q-tables as dense
    # device arrays (S, A, d) instead of python dicts.
    num_states: int | None = None

    def state_index(self, obs: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError(f"{self.name} has no discrete state indexing")

    def pareto_front(self, gamma: float) -> np.ndarray | None:
        """Known discounted Pareto front, when the env has one (host numpy).

        Mirrors MO-Gymnasium's ``env.unwrapped.pareto_front(gamma)`` used for
        IGD/MUL (reference experiments/benchmark/launch_experiment.py:203-206).
        """
        return None
