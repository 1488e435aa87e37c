"""Deep Sea Treasure — pure-JAX MO env (2 objectives: treasure, time).

Behavioral counterpart of MO-Gymnasium's ``deep-sea-treasure-v0`` /
``deep-sea-treasure-concave-v0`` used throughout the reference tests and
benchmarks (reference tests/test_algos.py:42-65, BASELINE configs).  The
canonical 11x10 submarine grid (Vamplew et al., 2011): the agent starts at the
surface top-left, moves up/down/left/right, sea floor deepens to the right,
and each column's floor cell holds a treasure of increasing value.  Rewards
are (treasure, -1 time penalty); the episode terminates on treasure pickup.

Entirely branch-free jnp: the map is two static per-column arrays
(treasure depth, treasure value); moving into ground is an elementwise clamp.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import Box, Discrete, MOEnv, StepOut

# Column -> row of the treasure (sea floor) and treasure values.
_DEPTHS = np.array([1, 2, 3, 4, 4, 4, 7, 7, 9, 10], dtype=np.int32)
_CONVEX_VALUES = np.array(
    [0.7, 8.2, 11.5, 14.0, 15.1, 16.1, 19.6, 20.3, 22.4, 23.7], dtype=np.float32
)
_CONCAVE_VALUES = np.array(
    [1.0, 2.0, 3.0, 5.0, 8.0, 16.0, 24.0, 50.0, 74.0, 124.0], dtype=np.float32
)

_N_ROWS = 11
_N_COLS = 10


class DSTState(NamedTuple):
    row: jnp.ndarray  # int32
    col: jnp.ndarray  # int32
    t: jnp.ndarray  # int32 step counter


class DeepSeaTreasure(MOEnv):
    """2-objective grid world.  ``dst_map``: "convex" (default) or "concave"."""

    reward_dim = 2
    name = "deep-sea-treasure-v0"

    def __init__(self, dst_map: str = "convex", max_episode_steps: int = 500):
        if dst_map == "convex":
            values = _CONVEX_VALUES
        elif dst_map == "concave":
            values = _CONCAVE_VALUES
            self.name = "deep-sea-treasure-concave-v0"
        else:
            raise ValueError(dst_map)
        self._values = jnp.asarray(values)
        self._depths = jnp.asarray(_DEPTHS)
        self._values_np = values
        self.max_episode_steps = max_episode_steps
        self.observation_space = Box(low=(0.0, 0.0), high=(float(_N_ROWS - 1), float(_N_COLS - 1)))
        self.action_space = Discrete(4)

    def _obs(self, state: DSTState) -> jnp.ndarray:
        return jnp.stack([state.row, state.col]).astype(jnp.float32)

    def reset(self, key: jax.Array):
        state = DSTState(jnp.int32(0), jnp.int32(0), jnp.int32(0))
        return state, self._obs(state)

    def step(self, state: DSTState, action: jnp.ndarray, key: jax.Array) -> StepOut:
        action = jnp.asarray(action, dtype=jnp.int32)
        # 0=up 1=down 2=left 3=right
        drow = jnp.array([-1, 1, 0, 0], dtype=jnp.int32)[action]
        dcol = jnp.array([0, 0, -1, 1], dtype=jnp.int32)[action]
        row = jnp.clip(state.row + drow, 0, _N_ROWS - 1)
        col = jnp.clip(state.col + dcol, 0, _N_COLS - 1)
        # ground below each column's treasure: blocked -> stay in place
        blocked = row > self._depths[col]
        row = jnp.where(blocked, state.row, row)
        col = jnp.where(blocked, state.col, col)
        on_treasure = row == self._depths[col]
        treasure = jnp.where(on_treasure, self._values[col], 0.0)
        reward = jnp.stack([treasure, jnp.float32(-1.0)])
        t = state.t + 1
        new_state = DSTState(row, col, t)
        terminated = on_treasure
        truncated = t >= self.max_episode_steps
        return StepOut(new_state, self._obs(new_state), reward, terminated, truncated)

    num_states = _N_ROWS * _N_COLS

    def state_index(self, obs: jnp.ndarray) -> jnp.ndarray:
        return (obs[..., 0] * _N_COLS + obs[..., 1]).astype(jnp.int32)

    def pareto_front(self, gamma: float) -> np.ndarray:
        """Discounted front: one point per treasure, reached by the shortest path.

        Shortest path to column c's treasure is c rights + depth[c] downs.
        Treasure lands on the final step (discount gamma^(t-1)); time penalty
        accrues -1 every step.
        """
        pts = []
        for c in range(_N_COLS):
            t = int(_DEPTHS[c]) + c
            disc_treasure = float(self._values_np[c]) * gamma ** (t - 1)
            disc_time = -sum(gamma**k for k in range(t))
            pts.append([disc_treasure, disc_time])
        pts = np.asarray(pts, dtype=np.float64)
        from ..core.pareto import filter_pareto_dominated

        return filter_pareto_dominated(pts)

    def render_frame(self, state: DSTState, cell: int = 24) -> np.ndarray:
        """(H, W, 3) uint8 image of the grid (host-side, visualization only)."""
        row, col = int(np.asarray(state.row)), int(np.asarray(state.col))
        depths = np.asarray(self._depths)
        img = np.zeros((_N_ROWS * cell, _N_COLS * cell, 3), dtype=np.uint8)
        for r in range(_N_ROWS):
            for c in range(_N_COLS):
                if r > depths[c]:
                    color = (60, 50, 40)  # seabed
                elif r == depths[c]:
                    color = (230, 200, 60)  # treasure
                else:
                    color = (30, 90, 180)  # sea
                img[r * cell : (r + 1) * cell, c * cell : (c + 1) * cell] = color
        img[row * cell + 4 : (row + 1) * cell - 4, col * cell + 4 : (col + 1) * cell - 4] = (220, 50, 50)
        return img
