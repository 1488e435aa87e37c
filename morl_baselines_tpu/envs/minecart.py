"""Minecart — pure-JAX MO env (3 objectives: ore1, ore2, fuel).

Behavioral counterpart of MO-Gymnasium's ``minecart-v0`` /
``minecart-deterministic-v0`` (Abels et al., 2019), the reference's main
discrete multi-policy benchmark (reference tests/test_algos.py:165-208,
BASELINE Envelope config, ref_point [0, 0, -200]).

A cart starts at the home port in the top-left corner of the unit square,
drives under momentum + rotation control to one of 5 mines on an arc, mines a
mixture of two ores (stochastic amounts unless ``deterministic``), and sells
on returning home.  Rewards: (ore1 sold, ore2 sold, fuel consumed<0).
Actions (6): 0=mine, 1=left, 2=right, 3=accelerate, 4=brake, 5=none.
Observation (7): x, y, speed, sin(angle), cos(angle), cargo1, cargo2.

The geometry/physics constants reproduce the published environment's scale
(5 mines on an arc, capacity 1.5, fuel costs -0.005 idle / -0.025 accelerate /
-0.05 mine); mine ore distributions interpolate from ore1-rich to ore2-rich
across the arc, so the Pareto front trades off ore mix vs fuel, as published.
All dynamics are branch-free jnp.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import Box, Discrete, MOEnv, StepOut

# --- geometry ---------------------------------------------------------------
_HOME = np.array([0.0, 0.0], dtype=np.float32)
_HOME_RADIUS = 0.15
_MINE_RADIUS = 0.14
_N_MINES = 5
_MINE_ANGLES = np.deg2rad(np.linspace(15.0, 75.0, _N_MINES)).astype(np.float32)
_MINE_POS = np.stack([0.7 * np.cos(_MINE_ANGLES), 0.7 * np.sin(_MINE_ANGLES)], axis=-1)
# ore means: interpolate ore1-rich -> ore2-rich across the arc
_t = np.linspace(0.0, 1.0, _N_MINES, dtype=np.float32)
_MINE_MEANS = np.stack([0.65 * (1 - _t) + 0.05 * _t, 0.05 * (1 - _t) + 0.65 * _t], axis=-1)
_MINE_STD = 0.1

# --- physics ----------------------------------------------------------------
_ACCEL = 0.0025
_MAX_SPEED = 0.02
_ROTATION = np.deg2rad(15.0)
_CAPACITY = 1.5
_FUEL_IDLE = -0.005
_FUEL_ACC = -0.025
_FUEL_MINE = -0.05


class MinecartState(NamedTuple):
    pos: jnp.ndarray  # (2,)
    speed: jnp.ndarray
    angle: jnp.ndarray  # radians
    cargo: jnp.ndarray  # (2,)
    departed: jnp.ndarray  # bool: left home at least once
    t: jnp.ndarray


class Minecart(MOEnv):
    reward_dim = 3
    name = "minecart-v0"

    def __init__(self, deterministic: bool = False, max_episode_steps: int = 1000):
        self.deterministic = deterministic
        if deterministic:
            self.name = "minecart-deterministic-v0"
        self.max_episode_steps = max_episode_steps
        self.observation_space = Box(
            low=(0.0, 0.0, 0.0, -1.0, -1.0, 0.0, 0.0),
            high=(1.0, 1.0, 1.0, 1.0, 1.0, float(_CAPACITY), float(_CAPACITY)),
        )
        self.action_space = Discrete(6)
        self._mine_pos = jnp.asarray(_MINE_POS)
        self._mine_means = jnp.asarray(_MINE_MEANS)

    def _obs(self, s: MinecartState) -> jnp.ndarray:
        return jnp.concatenate(
            [
                s.pos,
                (s.speed / _MAX_SPEED)[None],
                jnp.sin(s.angle)[None],
                jnp.cos(s.angle)[None],
                s.cargo,
            ]
        ).astype(jnp.float32)

    def reset(self, key: jax.Array):
        s = MinecartState(
            pos=jnp.asarray(_HOME),
            speed=jnp.float32(0.0),
            angle=jnp.float32(np.deg2rad(45.0)),
            cargo=jnp.zeros(2),
            departed=jnp.bool_(False),
            t=jnp.int32(0),
        )
        return s, self._obs(s)

    def step(self, state: MinecartState, action: jnp.ndarray, key: jax.Array) -> StepOut:
        a = jnp.asarray(action, dtype=jnp.int32)
        mine_act = a == 0
        left = a == 1
        right = a == 2
        acc = a == 3
        brake = a == 4

        angle = state.angle + jnp.where(left, _ROTATION, 0.0) - jnp.where(right, _ROTATION, 0.0)
        speed = state.speed + jnp.where(acc, _ACCEL, 0.0)
        speed = jnp.where(brake, speed * 0.5, speed)
        speed = jnp.clip(speed, 0.0, _MAX_SPEED)
        pos = jnp.clip(state.pos + speed * jnp.stack([jnp.cos(angle), jnp.sin(angle)]), 0.0, 1.0)

        # mining: only effective within a mine's radius and below capacity
        d2 = jnp.sum((self._mine_pos - pos[None, :]) ** 2, axis=-1)
        in_mine = d2 <= _MINE_RADIUS**2
        nearest = jnp.argmin(d2)
        can_mine = mine_act & jnp.any(in_mine)
        mean = self._mine_means[nearest]
        if self.deterministic:
            mined = mean
        else:
            mined = jnp.maximum(mean + _MINE_STD * jax.random.normal(key, (2,)), 0.0)
        room = _CAPACITY - jnp.sum(state.cargo)
        mined = mined * jnp.minimum(1.0, room / jnp.maximum(jnp.sum(mined), 1e-8))
        cargo = state.cargo + jnp.where(can_mine, mined, 0.0)

        at_home = jnp.sum((pos - jnp.asarray(_HOME)) ** 2) <= _HOME_RADIUS**2
        departed = state.departed | ~at_home
        sell = at_home & departed & (jnp.sum(cargo) > 0)

        fuel = _FUEL_IDLE + jnp.where(acc, _FUEL_ACC, 0.0) + jnp.where(mine_act, _FUEL_MINE, 0.0)
        reward = jnp.concatenate([jnp.where(sell, cargo, jnp.zeros(2)), jnp.asarray(fuel)[None]])

        cargo = jnp.where(sell, jnp.zeros(2), cargo)
        t = state.t + 1
        new_state = MinecartState(pos, speed, angle, cargo, departed, t)
        return StepOut(
            new_state, self._obs(new_state), reward, sell, t >= self.max_episode_steps
        )

    def pareto_front(self, gamma: float) -> np.ndarray:
        """Approximate known front: policies "drive to mine i, mine k times, return".

        Travel time is estimated from the physics (full-throttle straight
        line); fuel is the per-step cost pattern of that open-loop policy.
        Self-consistent with this env's dynamics (not bit-identical to
        MO-Gymnasium's enumeration).
        """
        from ..core.pareto import filter_pareto_dominated

        pts = []
        for i in range(_N_MINES):
            dist = float(np.linalg.norm(_MINE_POS[i] - _HOME)) - _MINE_RADIUS
            # accelerate to max speed then cruise
            t_accel = int(np.ceil(_MAX_SPEED / _ACCEL))
            d_accel = sum(min(_ACCEL * (k + 1), _MAX_SPEED) for k in range(t_accel))
            if d_accel >= dist:
                t_out = int(np.ceil(np.sqrt(2 * dist / _ACCEL)))
            else:
                t_out = t_accel + int(np.ceil((dist - d_accel) / _MAX_SPEED))
            for k in (1, 2, 3):
                mined = np.minimum(_MINE_MEANS[i] * k, _CAPACITY * _MINE_MEANS[i] / _MINE_MEANS[i].sum() / 1.0)
                total_ore = min(float(_MINE_MEANS[i].sum() * k), _CAPACITY)
                mined = _MINE_MEANS[i] / _MINE_MEANS[i].sum() * total_ore
                t_total = 2 * t_out + k + 2  # +2 turn-around steps
                disc_sell = gamma ** (t_total - 1)
                fuel = 0.0
                for step in range(t_total):
                    c = _FUEL_IDLE
                    if step < t_accel or (t_out + k + 2 <= step < t_out + k + 2 + t_accel):
                        c += _FUEL_ACC
                    if t_out <= step < t_out + k:
                        c += _FUEL_MINE
                    fuel += (gamma**step) * c
                pts.append([mined[0] * disc_sell, mined[1] * disc_sell, fuel])
        # the all-idle policy (never leave home): zero ore, idle fuel
        idle_fuel = sum((gamma**s) * _FUEL_IDLE for s in range(self.max_episode_steps))
        pts.append([0.0, 0.0, idle_fuel])
        return filter_pareto_dominated(np.asarray(pts, dtype=np.float64))
