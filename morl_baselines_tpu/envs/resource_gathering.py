"""Resource Gathering — pure-JAX MO env (3 objectives: enemy, gold, gem).

Behavioral counterpart of MO-Gymnasium's ``resource-gathering-v0`` (Barrett &
Narayanan, 2008), one of the reference's known-Pareto-front envs
(reference common/experiments.py:45-52).  5x5 grid; the agent starts at home
(4, 2), can pick up gold at (0, 2) and a gem at (1, 4); enemy cells (0, 3) and
(2, 2) attack with probability 0.1, sending the agent home empty-handed with
reward (-1, 0, 0) and ending the episode; returning home with resources gives
(0, gold, gem) and ends the episode.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import Box, Discrete, MOEnv, StepOut

_HOME = (4, 2)
_GOLD = (0, 2)
_GEM = (1, 4)
_ENEMIES = ((0, 3), (2, 2))


class RGState(NamedTuple):
    row: jnp.ndarray
    col: jnp.ndarray
    has_gold: jnp.ndarray  # bool
    has_gem: jnp.ndarray  # bool
    t: jnp.ndarray


class ResourceGathering(MOEnv):
    reward_dim = 3
    name = "resource-gathering-v0"

    def __init__(self, enemy_proba: float = 0.1, max_episode_steps: int = 100):
        self.enemy_proba = enemy_proba
        self.max_episode_steps = max_episode_steps
        self.observation_space = Box(low=(0.0,) * 4, high=(4.0, 4.0, 1.0, 1.0))
        self.action_space = Discrete(4)

    num_states = 100  # 25 cells x 4 resource-carry combos

    def state_index(self, obs: jnp.ndarray) -> jnp.ndarray:
        cell = obs[..., 0] * 5 + obs[..., 1]
        carry = obs[..., 2] + 2.0 * obs[..., 3]
        return (cell + 25.0 * carry).astype(jnp.int32)

    def _obs(self, s: RGState) -> jnp.ndarray:
        return jnp.stack(
            [
                s.row.astype(jnp.float32),
                s.col.astype(jnp.float32),
                s.has_gold.astype(jnp.float32),
                s.has_gem.astype(jnp.float32),
            ]
        )

    def reset(self, key: jax.Array):
        s = RGState(jnp.int32(_HOME[0]), jnp.int32(_HOME[1]), jnp.bool_(False), jnp.bool_(False), jnp.int32(0))
        return s, self._obs(s)

    def step(self, state: RGState, action: jnp.ndarray, key: jax.Array) -> StepOut:
        action = jnp.asarray(action, dtype=jnp.int32)
        drow = jnp.array([-1, 1, 0, 0], dtype=jnp.int32)[action]
        dcol = jnp.array([0, 0, -1, 1], dtype=jnp.int32)[action]
        row = jnp.clip(state.row + drow, 0, 4)
        col = jnp.clip(state.col + dcol, 0, 4)

        on_enemy = jnp.zeros((), dtype=bool)
        for er, ec in _ENEMIES:
            on_enemy = on_enemy | ((row == er) & (col == ec))
        attacked = on_enemy & (jax.random.uniform(key) < self.enemy_proba)

        has_gold = state.has_gold | ((row == _GOLD[0]) & (col == _GOLD[1]))
        has_gem = state.has_gem | ((row == _GEM[0]) & (col == _GEM[1]))
        at_home = (row == _HOME[0]) & (col == _HOME[1])
        delivered = at_home & (state.has_gold | state.has_gem)

        reward = jnp.where(
            attacked,
            jnp.array([-1.0, 0.0, 0.0]),
            jnp.where(
                delivered,
                jnp.stack([jnp.float32(0.0), state.has_gold.astype(jnp.float32), state.has_gem.astype(jnp.float32)]),
                jnp.zeros(3),
            ),
        )
        # attack resets position home and drops resources
        row = jnp.where(attacked, _HOME[0], row)
        col = jnp.where(attacked, _HOME[1], col)
        has_gold = jnp.where(attacked | delivered, False, has_gold)
        has_gem = jnp.where(attacked | delivered, False, has_gem)
        t = state.t + 1
        new_state = RGState(row, col, has_gold, has_gem, t)
        terminated = attacked | delivered
        truncated = t >= self.max_episode_steps
        return StepOut(new_state, self._obs(new_state), reward, terminated, truncated)

    def pareto_front(self, gamma: float) -> np.ndarray:
        """Known deterministic-policy front under the safe routes.

        Enumerated from route lengths of the canonical solutions: gem-only
        (safe, 8 steps), gold-only safe detour (10 steps), both (12 steps),
        plus risky short routes through enemy cells whose expected returns are
        computed with the 0.1 attack probability.
        """
        from ..core.pareto import filter_pareto_dominated

        p = self.enemy_proba
        pts = []

        def disc(t):
            return gamma ** (t - 1)

        # safe routes (no enemy cell): lengths round-trip
        pts.append([0.0, 0.0, disc(8)])  # gem only: home->gem 4 steps, back 4
        pts.append([0.0, disc(10), 0.0])  # gold via left detour: 5 out, 5 back
        pts.append([0.0, disc(12), disc(12)])  # both, safe: 12 steps total
        # risky gold route straight up through enemy at (2,2)->(1,2)->(0,2): 4 out
        # passes enemy (2,2) twice (out+back, 8 steps); survive prob (1-p)^2
        q = 1.0 - p
        surv = q * q
        # expected: success gives gold at step 8; failure gives -1 at the attack step
        exp_gold = surv * disc(8)
        exp_enemy = -(1 - surv) * disc(3)  # approx first-passage discount
        pts.append([exp_enemy, exp_gold, 0.0])
        return filter_pareto_dominated(np.asarray(pts, dtype=np.float64))
