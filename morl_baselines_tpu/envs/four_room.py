"""Four-Room — pure-JAX 3-objective gridworld.

Companion of MO-Gymnasium's ``four-room-v0`` (itself after the successor-
features four-room of Barreto et al.): a 13x13 grid split into four rooms by
walls with one doorway per side; items of three shapes are scattered through
the rooms and picking one up yields +1 on that shape's objective; reaching
the goal cell terminates the episode. Observation is the agent position plus
the remaining-item bitmap, so the state is fully enumerable and the env
supports dense tabular Q-tables via ``state_index``. Item placement here is
a fixed symmetric layout regenerated from the published room geometry
(documented deviation — the upstream package randomizes per seed).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import Box, Discrete, MOEnv, StepOut

_N = 13
# walls: row 6 and col 6, with doorways at (6,3), (6,9), (3,6), (9,6)
_WALLS = np.zeros((_N, _N), dtype=bool)
_WALLS[6, :] = True
_WALLS[:, 6] = True
for r, c in [(6, 3), (6, 9), (3, 6), (9, 6)]:
    _WALLS[r, c] = False
# items: (row, col, shape 0..2), three per shape, spread over the rooms
_ITEMS = np.array(
    [
        (2, 2, 0), (10, 10, 0), (2, 10, 0),
        (10, 2, 1), (4, 4, 1), (8, 8, 1),
        (4, 8, 2), (8, 4, 2), (11, 5, 2),
    ],
    dtype=np.int32,
)
_START = (12, 0)
_GOAL = (0, 12)
_NUM_ITEMS = len(_ITEMS)


class FourRoomState(NamedTuple):
    row: jnp.ndarray
    col: jnp.ndarray
    items: jnp.ndarray  # (9,) bool, True = still present
    t: jnp.ndarray


class FourRoom(MOEnv):
    """3 objectives: one per item shape; +1 on pickup, episode ends at the goal."""

    reward_dim = 3
    name = "four-room-v0"
    num_states = _N * _N * (2**_NUM_ITEMS)

    def __init__(self, max_episode_steps: int = 200):
        self.max_episode_steps = max_episode_steps
        self.observation_space = Box(
            low=tuple([0.0, 0.0] + [0.0] * _NUM_ITEMS),
            high=tuple([float(_N - 1)] * 2 + [1.0] * _NUM_ITEMS),
        )
        self.action_space = Discrete(4)
        self._walls = jnp.asarray(_WALLS)
        self._item_pos = jnp.asarray(_ITEMS[:, :2])
        self._item_shape = jnp.asarray(_ITEMS[:, 2])

    def _obs(self, s: FourRoomState) -> jnp.ndarray:
        return jnp.concatenate(
            [jnp.stack([s.row, s.col]).astype(jnp.float32), s.items.astype(jnp.float32)]
        )

    def state_index(self, obs: jnp.ndarray) -> jnp.ndarray:
        row = obs[..., 0].astype(jnp.int32)
        col = obs[..., 1].astype(jnp.int32)
        bits = obs[..., 2:].astype(jnp.int32)
        mask = jnp.sum(bits * (2 ** jnp.arange(_NUM_ITEMS)), axis=-1, dtype=jnp.int32)
        return (row * _N + col) * (2**_NUM_ITEMS) + mask

    def reset(self, key: jax.Array):
        s = FourRoomState(
            jnp.int32(_START[0]), jnp.int32(_START[1]), jnp.ones(_NUM_ITEMS, dtype=bool), jnp.int32(0)
        )
        return s, self._obs(s)

    def step(self, state: FourRoomState, action: jnp.ndarray, key: jax.Array) -> StepOut:
        action = jnp.asarray(action, dtype=jnp.int32)
        drow = jnp.array([-1, 1, 0, 0], dtype=jnp.int32)[action]
        dcol = jnp.array([0, 0, -1, 1], dtype=jnp.int32)[action]
        row = jnp.clip(state.row + drow, 0, _N - 1)
        col = jnp.clip(state.col + dcol, 0, _N - 1)
        hit_wall = self._walls[row, col]
        row = jnp.where(hit_wall, state.row, row)
        col = jnp.where(hit_wall, state.col, col)
        here = (self._item_pos[:, 0] == row) & (self._item_pos[:, 1] == col) & state.items
        reward = jnp.zeros(3).at[self._item_shape].add(here.astype(jnp.float32))
        items = state.items & jnp.logical_not(here)
        t = state.t + 1
        terminated = (row == _GOAL[0]) & (col == _GOAL[1])
        new = FourRoomState(row, col, items, t)
        return StepOut(new, self._obs(new), reward, terminated, t >= self.max_episode_steps)
