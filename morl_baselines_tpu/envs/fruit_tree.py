"""Fruit Tree Navigation — pure-JAX MO env (6 objectives).

Behavioral counterpart of MO-Gymnasium's ``fruit-tree-v0`` (Yang et al.,
2019), used by the reference for 6-objective testing (reference
tests/test_algos.py:306 with ref_point zeros(6)).  A full binary tree of depth
``depth`` (5/6/7); from the root the agent goes left/right each step; each
leaf holds a 6-dim nutrient vector (Protein, Carbs, Fats, Vitamins, Minerals,
Water); the reward is that vector on arrival at the leaf, zeros elsewhere.

The leaf nutrient table in MO-Gymnasium is a hard-coded literal originally
*randomly generated on the positive part of a 6-sphere* (Yang et al. app. C);
we reproduce that construction deterministically from a fixed seed rather
than copying the literal — every leaf value is non-dominated by construction
after normalization.

``pareto_front(gamma)`` is **exact for this env**: every policy reaches
exactly one leaf after ``depth`` steps and earns that leaf's vector
discounted by ``gamma**(depth-1)``, so the achievable return set is exactly
the discounted leaf table and the front is its non-dominated subset.  IGD/MUL
computed against it are therefore exact.  The one remaining caveat is
cross-framework: published MO-Gymnasium fruit-tree curves use their specific
table literal (not in this image), so absolute HV numbers are not comparable
across the two tables even though both tables are draws from the same
construction — all within-framework comparisons and metric semantics are.
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import Box, Discrete, MOEnv, StepOut


@lru_cache(maxsize=8)
def _make_fruits(depth: int, seed: int = 7) -> np.ndarray:
    """(2**depth, 6) leaf rewards on the positive unit 6-sphere, scaled x10."""
    rng = np.random.default_rng(seed)
    x = np.abs(rng.normal(size=(2**depth, 6))) + 1e-3
    x = x / np.linalg.norm(x, axis=-1, keepdims=True)
    return (10.0 * x).astype(np.float32)


class FruitTreeState(NamedTuple):
    level: jnp.ndarray  # int32 in [0, depth]
    index: jnp.ndarray  # int32 node index within level


class FruitTree(MOEnv):
    reward_dim = 6
    name = "fruit-tree-v0"

    def __init__(self, depth: int = 6):
        assert depth in (5, 6, 7)
        self.depth = depth
        self.max_episode_steps = depth
        self._fruits = jnp.asarray(_make_fruits(depth))
        self.observation_space = Box(low=(0.0, 0.0), high=(float(depth), float(2**depth - 1)))
        self.action_space = Discrete(2)

    @property
    def num_states(self):  # nodes of the full binary tree
        return 2 ** (self.depth + 1) - 1

    def state_index(self, obs: jnp.ndarray) -> jnp.ndarray:
        level = obs[..., 0]
        index = obs[..., 1]
        return (2.0**level - 1.0 + index).astype(jnp.int32)

    def _obs(self, state: FruitTreeState) -> jnp.ndarray:
        return jnp.stack([state.level, state.index]).astype(jnp.float32)

    def reset(self, key: jax.Array):
        state = FruitTreeState(jnp.int32(0), jnp.int32(0))
        return state, self._obs(state)

    def step(self, state: FruitTreeState, action: jnp.ndarray, key: jax.Array) -> StepOut:
        action = jnp.asarray(action, dtype=jnp.int32)
        level = state.level + 1
        index = state.index * 2 + action
        at_leaf = level >= self.depth
        reward = jnp.where(at_leaf, self._fruits[jnp.clip(index, 0, 2**self.depth - 1)], jnp.zeros(6))
        new_state = FruitTreeState(level, index)
        return StepOut(new_state, self._obs(new_state), reward, at_leaf, jnp.bool_(False))

    def pareto_front(self, gamma: float) -> np.ndarray:
        fruits = np.asarray(_make_fruits(self.depth), dtype=np.float64) * gamma ** (self.depth - 1)
        from ..core.pareto import filter_pareto_dominated

        return filter_pareto_dominated(fruits, keep_duplicates=False)
