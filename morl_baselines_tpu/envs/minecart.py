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

    # ------------------------------------------------------------------ front

    def _scripted_rollout_returns(self, gamma: float) -> np.ndarray:
        """True discounted returns of the scripted mine-and-return policy
        family, obtained by SIMULATING each policy under this env's exact
        dynamics (deterministic ore means) — the same construction
        MO-Gymnasium's ``pareto_front(gamma)`` uses (scripted policies per
        mine; consumed by reference launch_experiment.py:203-206).

        Policy parameters: target mine i, number of mine actions k, and the
        acceleration budget n_acc (fewer accelerations = slower but cheaper
        travel).  Controller: rotate to face the mine, accelerate n_acc times
        then coast, brake on entering the mine radius, mine k times, rotate
        180 degrees, accelerate n_acc times and coast home; the sale fires in
        the env itself.
        """
        det_env = Minecart(deterministic=True, max_episode_steps=self.max_episode_steps)

        mine_ids, ks, naccs = np.meshgrid(
            np.arange(_N_MINES), np.array([1, 2, 3]), np.array([1, 2, 4, 8]), indexing="ij"
        )
        mine_ids = jnp.asarray(mine_ids.ravel(), dtype=jnp.int32)
        ks = jnp.asarray(ks.ravel(), dtype=jnp.int32)
        naccs = jnp.asarray(naccs.ravel(), dtype=jnp.int32)
        # rotation steps from the start angle (45 deg) to the mine angle, in
        # +/-15 deg increments (mine angles are exact multiples)
        rot_out = jnp.asarray(
            np.rint((_MINE_ANGLES - np.deg2rad(45.0)) / _ROTATION).astype(np.int32)
        )[mine_ids]

        def rollout(mine_i, k, n_acc, rot):
            env_s, _ = det_env.reset(jax.random.key(0))
            ctrl0 = dict(
                rot_out=jnp.abs(rot),
                acc_out=n_acc,
                brake=jnp.int32(10),
                mine=k,
                rot_back=jnp.int32(12),
                acc_back=n_acc,
            )

            def body(carry, _):
                env_s, c, ret, gpow, done = carry
                d2 = jnp.sum((det_env._mine_pos - env_s.pos[None, :]) ** 2, axis=-1)
                in_mine = jnp.any(d2 <= _MINE_RADIUS**2)
                outbound = c["mine"] > 0
                # priority cascade: rotate out -> travel out -> brake ->
                # mine -> rotate back -> accelerate back -> coast
                a = jnp.int32(5)
                a = jnp.where((c["acc_back"] > 0) & ~outbound & (c["rot_back"] == 0), 3, a)
                a = jnp.where((c["rot_back"] > 0) & ~outbound, 1, a)
                a = jnp.where(outbound & in_mine & (c["brake"] == 0), 0, a)
                a = jnp.where(outbound & in_mine & (c["brake"] > 0), 4, a)
                a = jnp.where(outbound & ~in_mine & (c["acc_out"] > 0) & (c["rot_out"] == 0), 3, a)
                a = jnp.where(c["rot_out"] > 0, jnp.where(rot > 0, 1, 2), a)

                out = det_env.step(env_s, a, jax.random.key(0))
                nc = dict(
                    rot_out=c["rot_out"] - (c["rot_out"] > 0),
                    acc_out=c["acc_out"] - ((a == 3) & outbound),
                    brake=c["brake"] - (a == 4),
                    mine=c["mine"] - (a == 0),
                    rot_back=c["rot_back"] - ((a == 1) & ~outbound),
                    acc_back=c["acc_back"] - ((a == 3) & ~outbound),
                )
                ret = ret + jnp.where(done, 0.0, gpow) * out.reward
                done = done | out.terminated | out.truncated
                return (out.state, nc, ret, gpow * gamma, done), None

            init = (env_s, ctrl0, jnp.zeros(3), jnp.float32(1.0), jnp.bool_(False))
            (fs, _, ret, _, done), _ = jax.lax.scan(body, init, None, length=self.max_episode_steps)
            return ret, done

        rets, dones = jax.jit(jax.vmap(rollout))(mine_ids, ks, naccs, rot_out)
        rets = np.asarray(rets, dtype=np.float64)
        # keep only policies that actually completed a sale
        return rets[np.asarray(dones)]

    def pareto_front(self, gamma: float) -> np.ndarray:
        """Known discounted front: exact-by-construction via simulation of the
        scripted policy family under this env's own dynamics, plus the idle
        policy (never leave home: zero ore, idle fuel to the horizon)."""
        from ..core.pareto import filter_pareto_dominated

        pts = list(self._scripted_rollout_returns(gamma))
        idle_fuel = _FUEL_IDLE * (1.0 - gamma**self.max_episode_steps) / (1.0 - gamma) if gamma < 1.0 else _FUEL_IDLE * self.max_episode_steps
        pts.append(np.array([0.0, 0.0, idle_fuel]))
        return filter_pareto_dominated(np.asarray(pts, dtype=np.float64), keep_duplicates=False)
