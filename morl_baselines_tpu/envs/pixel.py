"""Pixel-observation Deep Sea Treasure — device-rendered RGB frames.

The reference exercises its CNN path on mo-supermario through the wrap_mario
stack (launch_experiment.py:158-180); the NES emulator behind that env cannot
run on-device, so this env plays the same architectural role TPU-natively: a
pure-JAX env whose observation is an (88, 80, 3) uint8 frame rendered from the
DST grid entirely with jnp ops (static background + dynamic agent overlay).
Thousands of copies render under `vmap` inside the jitted actor-learner, and
the full mario wrapper stack (MaxAndSkip/Resize/Grayscale/FrameStack, see
wrappers.py) + NatureCNN trunk run on it end-to-end.

Dynamics, rewards, and the known Pareto front are exactly DeepSeaTreasure's.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .base import ArrayBox, MOEnv, StepOut
from .dst import _DEPTHS, _N_COLS, _N_ROWS, DeepSeaTreasure, DSTState

_CELL = 8  # pixels per grid cell: 11x10 grid -> 88x80 frame


class PixelDST(MOEnv):
    reward_dim = 2
    name = "deep-sea-treasure-pixel-v0"

    def __init__(self, dst_map: str = "convex", max_episode_steps: int = 500):
        self._inner = DeepSeaTreasure(dst_map=dst_map, max_episode_steps=max_episode_steps)
        self.max_episode_steps = max_episode_steps
        self.action_space = self._inner.action_space
        self.observation_space = ArrayBox(0, 255, (_N_ROWS * _CELL, _N_COLS * _CELL, 3))
        # static background (sea / seabed / treasure cells), built once on host
        depths = np.asarray(_DEPTHS)
        bg = np.zeros((_N_ROWS, _N_COLS, 3), dtype=np.uint8)
        for r in range(_N_ROWS):
            for c in range(_N_COLS):
                if r > depths[c]:
                    bg[r, c] = (60, 50, 40)
                elif r == depths[c]:
                    bg[r, c] = (230, 200, 60)
                else:
                    bg[r, c] = (30, 90, 180)
        self._bg = jnp.asarray(np.kron(bg, np.ones((_CELL, _CELL, 1), dtype=np.uint8)))
        self._agent_color = jnp.asarray((220, 50, 50), dtype=jnp.uint8)

    def _render(self, state: DSTState) -> jnp.ndarray:
        rows = jnp.arange(_N_ROWS * _CELL) // _CELL
        cols = jnp.arange(_N_COLS * _CELL) // _CELL
        mask = (rows[:, None] == state.row) & (cols[None, :] == state.col)
        return jnp.where(mask[..., None], self._agent_color, self._bg)

    def reset(self, key: jax.Array):
        state, _ = self._inner.reset(key)
        return state, self._render(state)

    def step(self, state: DSTState, action, key: jax.Array) -> StepOut:
        out = self._inner.step(state, action, key)
        return out._replace(obs=self._render(out.state))

    def pareto_front(self, gamma: float) -> np.ndarray:
        return self._inner.pareto_front(gamma)
