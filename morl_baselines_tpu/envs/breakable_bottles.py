"""Breakable Bottles — pure-JAX 3-objective low-impact gridworld.

Companion of MO-Gymnasium's ``breakable-bottles-v0`` (Vamplew et al.,
"Potential-based multiobjective reinforcement learning approaches to
low-impact agents"): a 5-cell corridor with a bottle source at cell 0 and a
destination at cell 4. The agent picks up bottles (carrying at most two);
while carrying two there is a 10% chance per move of dropping one in the
current cell, and dropped bottles break. Delivering two bottles ends the
episode. Objectives:

    r = [ time penalty (-1 per step),
          delivery reward (+25 on completing the 2-bottle delivery),
          impact penalty (-1 per bottle newly broken) ]

Potential-shaping variants of the impact objective in the paper are left to
the agent's scalarization (documented deviation).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .base import Box, Discrete, MOEnv, StepOut

_N_CELLS = 5
_MAX_CARRY = 2
_DROP_PROB = 0.1


class BottlesState(NamedTuple):
    loc: jnp.ndarray  # 0..4
    carrying: jnp.ndarray  # 0..2
    delivered: jnp.ndarray  # 0..2
    dropped: jnp.ndarray  # (5,) bottles broken per cell
    t: jnp.ndarray


class BreakableBottles(MOEnv):
    """Actions: 0 left, 1 right, 2 pick up (at the source)."""

    reward_dim = 3
    name = "breakable-bottles-v0"
    num_states = _N_CELLS * (_MAX_CARRY + 1) * 3 * 2  # loc x carry x delivered x any-broken

    def __init__(self, max_episode_steps: int = 100):
        self.max_episode_steps = max_episode_steps
        self.observation_space = Box(
            low=(0.0, 0.0, 0.0, 0.0),
            high=(float(_N_CELLS - 1), float(_MAX_CARRY), 2.0, float(max_episode_steps)),
        )
        self.action_space = Discrete(3)

    def _obs(self, s: BottlesState) -> jnp.ndarray:
        return jnp.stack(
            [s.loc, s.carrying, s.delivered, jnp.sum(s.dropped)]
        ).astype(jnp.float32)

    def state_index(self, obs: jnp.ndarray) -> jnp.ndarray:
        loc = obs[..., 0].astype(jnp.int32)
        carry = obs[..., 1].astype(jnp.int32)
        deliv = obs[..., 2].astype(jnp.int32)
        broken = (obs[..., 3] > 0).astype(jnp.int32)
        return ((loc * (_MAX_CARRY + 1) + carry) * 3 + deliv) * 2 + broken

    def reset(self, key: jax.Array):
        s = BottlesState(
            jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.zeros(_N_CELLS, dtype=jnp.int32), jnp.int32(0)
        )
        return s, self._obs(s)

    def step(self, state: BottlesState, action: jnp.ndarray, key: jax.Array) -> StepOut:
        action = jnp.asarray(action, dtype=jnp.int32)
        move = jnp.where(action == 0, -1, jnp.where(action == 1, 1, 0))
        loc = jnp.clip(state.loc + move, 0, _N_CELLS - 1)
        # pickup only at the source, up to the carry limit
        can_pick = (action == 2) & (state.loc == 0) & (state.carrying < _MAX_CARRY)
        carrying = state.carrying + can_pick.astype(jnp.int32)
        # moving with two bottles risks dropping one (it breaks where it lands);
        # only actual displacement counts, not a clipped move at the boundary
        drops = (
            (loc != state.loc)
            & (carrying == _MAX_CARRY)
            & (jax.random.uniform(key, ()) < _DROP_PROB)
        )
        carrying = carrying - drops.astype(jnp.int32)
        dropped = state.dropped.at[loc].add(drops.astype(jnp.int32))
        # delivery at the destination
        at_dest = loc == _N_CELLS - 1
        deliver = jnp.where(at_dest, carrying, 0)
        delivered = jnp.clip(state.delivered + deliver, 0, 2)
        carrying = jnp.where(at_dest, 0, carrying)
        done = delivered >= 2
        reward = jnp.stack(
            [
                jnp.float32(-1.0),
                jnp.where(done, 25.0, 0.0),
                -drops.astype(jnp.float32),
            ]
        )
        t = state.t + 1
        new = BottlesState(loc, carrying, delivered, dropped, t)
        return StepOut(new, self._obs(new), reward, done, t >= self.max_episode_steps)
