"""MO-MuJoCo environments — host-stepped gymnasium physics behind the pure API.

Counterpart of MO-Gymnasium's MuJoCo suite (mo-hopper, mo-halfcheetah, ...)
used by the reference's continuous-control benchmarks (BASELINE configs;
reference tests use mo-hopper-v5).  MJX is not available in this image, so
the MuJoCo step runs on host inside ``jax.experimental.io_callback`` while
exposing exactly the same pure-functional ``reset(key)/step(state, a, key)``
API as the device envs — agents, vector wrappers, scans, and the vmapped
evaluation pipeline work unchanged (io_callback with ordered=False is
vmappable; the callback is applied per batch element).

Env state on device is just a slot index into a host-side pool of gymnasium
env instances (allocated round-robin on reset).  The vector of rewards is
computed from the info dict the way MO-Gymnasium decomposes them:

- mo-hopper-v5: (forward velocity, jump height 10*(z - z_init), -energy)
- mo-halfcheetah-v5: (forward velocity, -energy)

This path trades throughput for parity (one host round-trip per step); the
device-resident envs remain the performance path.
"""

from __future__ import annotations

import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .base import Box, MOEnv, StepOut


class _HostPool:
    """Round-robin pool of gymnasium env instances, host side."""

    def __init__(self, make_fn: Callable, max_envs: int = 4096):
        self.make_fn = make_fn
        self.max_envs = max_envs
        self.envs: list = []
        self.counter = 0
        self.lock = threading.Lock()

    def alloc(self) -> int:
        with self.lock:
            if len(self.envs) < self.max_envs:
                self.envs.append(self.make_fn())
                return len(self.envs) - 1
            slot = self.counter % self.max_envs
            self.counter += 1
            return slot

    def env(self, slot: int):
        return self.envs[int(slot)]


class MOMuJoCoEnv(MOEnv):
    """Host-stepped MuJoCo env with vector rewards behind the functional API."""

    def __init__(
        self,
        gym_id: str,
        reward_dim: int,
        mo_reward_fn: Callable[[np.ndarray, np.ndarray, float, dict], np.ndarray],
        name: str,
        max_episode_steps: int = 1000,
    ):
        import gymnasium

        # max_episode_steps=-1 disables the inner TimeLimit entirely (in
        # gymnasium 1.2.2 `None` means "use the spec default", which would let
        # e.g. Reacher's 50-step limit fire before this adapter's own
        # truncation); this adapter applies its own truncation below.
        probe = gymnasium.make(gym_id, max_episode_steps=-1)
        self._gym_id = gym_id
        self._obs_dim = int(np.prod(probe.observation_space.shape))
        self._act_dim = int(np.prod(probe.action_space.shape))
        self.observation_space = Box(
            low=tuple(np.full(self._obs_dim, -np.inf)), high=tuple(np.full(self._obs_dim, np.inf))
        )
        self.action_space = Box(low=tuple(-np.ones(self._act_dim)), high=tuple(np.ones(self._act_dim)))
        self.reward_dim = reward_dim
        self.name = name
        self.max_episode_steps = max_episode_steps
        self._mo_reward_fn = mo_reward_fn
        self._act_scale = (probe.action_space.high - probe.action_space.low) / 2.0
        self._act_bias = (probe.action_space.high + probe.action_space.low) / 2.0
        probe.close()
        self._pool = _HostPool(lambda: gymnasium.make(gym_id, max_episode_steps=-1))

    # ---- host callbacks ----------------------------------------------------

    def _host_reset_slot(self, slot, seed) -> np.ndarray:
        """Reset an already-allocated pool slot; returns the reset obs."""
        obs, _info = self._pool.env(int(slot)).reset(seed=int(np.asarray(seed)) % (2**31 - 1))
        return np.asarray(obs, dtype=np.float32)

    def _host_reset(self, seed):
        slot = self._pool.alloc()
        return np.int32(slot), self._host_reset_slot(slot, seed)

    def _host_step(self, slot, action):
        env = self._pool.env(int(slot))
        a = np.asarray(action, dtype=np.float64) * self._act_scale + self._act_bias
        obs, _r, term, trunc, info = env.step(a)
        mo_r = self._mo_reward_fn(np.asarray(obs), a, float(_r), info)
        return (
            np.asarray(obs, dtype=np.float32),
            np.asarray(mo_r, dtype=np.float32),
            np.bool_(term),
            np.bool_(trunc),
        )

    # ---- batched host callbacks (one io_callback per *vector* step) --------
    #
    # VectorMOEnv dispatches to vector_reset/vector_step when present, so the
    # whole env batch crosses the host boundary once per step instead of once
    # per batch element (reference's hot env loop is a python for-loop per
    # env, gpi_pd_continuous_action.py:560-600; this is its batched analog).
    # Autoreset happens on host in the same callback (same-step semantics).

    @property
    def _executor(self) -> ThreadPoolExecutor:
        ex = getattr(self, "_executor_cached", None)
        if ex is None:
            import os

            ex = ThreadPoolExecutor(max_workers=max(2, (os.cpu_count() or 2)))
            self._executor_cached = ex
        return ex

    def _host_vector_reset(self, seeds):
        seeds = np.asarray(seeds)
        n = len(seeds)
        out = list(self._executor.map(lambda i: self._host_reset(seeds[i]), range(n)))
        slots = np.asarray([r[0] for r in out], dtype=np.int32)
        obs = np.stack([r[1] for r in out]).astype(np.float32)
        return slots, obs

    def _host_vector_step(self, slots, t, actions, seeds):
        slots = np.asarray(slots)
        t = np.asarray(t)
        actions = np.asarray(actions)
        seeds = np.asarray(seeds)
        n = len(slots)
        obs = np.empty((n, self._obs_dim), dtype=np.float32)
        final_obs = np.empty((n, self._obs_dim), dtype=np.float32)
        reward = np.empty((n, self.reward_dim), dtype=np.float32)
        term = np.empty((n,), dtype=np.bool_)
        trunc = np.empty((n,), dtype=np.bool_)
        new_t = np.empty((n,), dtype=np.int32)

        def one(i):
            o, r, te, tr = self._host_step(slots[i], actions[i])
            tr = bool(tr) or (int(t[i]) + 1 >= self.max_episode_steps)
            final_obs[i] = o
            reward[i] = r
            term[i] = te
            trunc[i] = tr
            if te or tr:
                obs[i] = self._host_reset_slot(slots[i], seeds[i])
                new_t[i] = 0
            else:
                obs[i] = o
                new_t[i] = int(t[i]) + 1

        list(self._executor.map(one, range(n)))
        return slots, new_t, obs, reward, term, trunc, final_obs

    def vector_reset(self, key: jax.Array, num_envs: int):
        seeds = jax.random.randint(key, (num_envs,), 0, 2**31 - 1)
        slots, obs = jax.experimental.io_callback(
            self._host_vector_reset,
            (
                jax.ShapeDtypeStruct((num_envs,), jnp.int32),
                jax.ShapeDtypeStruct((num_envs, self._obs_dim), jnp.float32),
            ),
            seeds,
            ordered=False,
            sharding=jax.sharding.SingleDeviceSharding(jax.devices()[0]),
        )
        return (slots, jnp.zeros((num_envs,), jnp.int32)), obs

    def vector_step(self, state, actions, key: jax.Array):
        from .vector import VecStepOut

        slots, t = state
        n = slots.shape[0]
        seeds = jax.random.randint(key, (n,), 0, 2**31 - 1)
        acts = self._device_vector_actions(actions, n)
        slots, new_t, obs, reward, term, trunc, final_obs = jax.experimental.io_callback(
            self._host_vector_step,
            (
                jax.ShapeDtypeStruct((n,), jnp.int32),
                jax.ShapeDtypeStruct((n,), jnp.int32),
                jax.ShapeDtypeStruct((n, self._obs_dim), jnp.float32),
                jax.ShapeDtypeStruct((n, self.reward_dim), jnp.float32),
                jax.ShapeDtypeStruct((n,), jnp.bool_),
                jax.ShapeDtypeStruct((n,), jnp.bool_),
                jax.ShapeDtypeStruct((n, self._obs_dim), jnp.float32),
            ),
            slots,
            t,
            acts,
            seeds,
            ordered=False,
            sharding=jax.sharding.SingleDeviceSharding(jax.devices()[0]),
        )
        return VecStepOut((slots, new_t), obs, reward, term, trunc, final_obs)

    # ---- functional API ----------------------------------------------------

    def _device_action(self, action) -> jnp.ndarray:
        """Device-side action representation handed to the host callback."""
        return jnp.asarray(action, dtype=jnp.float32).reshape(self._act_dim)

    def _device_vector_actions(self, actions, n) -> jnp.ndarray:
        return jnp.asarray(actions, dtype=jnp.float32).reshape(n, self._act_dim)

    def reset(self, key: jax.Array):
        seed = jax.random.randint(key, (), 0, 2**31 - 1)
        slot, obs = jax.experimental.io_callback(
            self._host_reset,
            (jax.ShapeDtypeStruct((), jnp.int32), jax.ShapeDtypeStruct((self._obs_dim,), jnp.float32)),
            seed,
            ordered=False,
            sharding=jax.sharding.SingleDeviceSharding(jax.devices()[0]),
        )
        return (slot, jnp.int32(0)), obs

    def step(self, state, action, key: jax.Array) -> StepOut:
        slot, t = state
        obs, reward, term, trunc = jax.experimental.io_callback(
            self._host_step,
            (
                jax.ShapeDtypeStruct((self._obs_dim,), jnp.float32),
                jax.ShapeDtypeStruct((self.reward_dim,), jnp.float32),
                jax.ShapeDtypeStruct((), jnp.bool_),
                jax.ShapeDtypeStruct((), jnp.bool_),
            ),
            slot,
            self._device_action(action),
            ordered=False,
            sharding=jax.sharding.SingleDeviceSharding(jax.devices()[0]),
        )
        t = t + 1
        return StepOut((slot, t), obs, reward, term, trunc | (t >= self.max_episode_steps))


def _hopper_mo_reward(obs, action, scalar_r, info):
    """(velocity, jump height, energy) — MO-Gymnasium mo-hopper decomposition."""
    vx = info.get("x_velocity", 0.0)
    z = obs[0]  # hopper obs[0] is the torso height
    height = 10.0 * (z - 1.25)  # 1.25 = initial torso height
    energy = -2e-4 * float(np.sum(np.square(action)))
    return np.array([vx, height, energy], dtype=np.float32)


def _halfcheetah_mo_reward(obs, action, scalar_r, info):
    """(velocity, energy) — MO-Gymnasium mo-halfcheetah decomposition."""
    vx = info.get("x_velocity", 0.0)
    energy = -0.1 * float(np.sum(np.square(action)))
    return np.array([vx, energy], dtype=np.float32)


class MOReacher(MOMuJoCoEnv):
    """MO Reacher: 4 objectives = closeness to 4 fixed targets, 9 discrete torques.

    Counterpart of MO-Gymnasium's ``mo-reacher-v5`` (the 4-target reacher of
    the Envelope paper): targets sit at radius 0.14 at angles 0/90/180/270,
    reward_i = 1 - 4*||fingertip - target_i||, actions are the 9 torque
    combinations {-1, 0, 1}^2, observation is
    [cos θ1, cos θ2, sin θ1, sin θ2, qvel1, qvel2].
    """

    _TORQUES = np.array(
        [[0, 0], [1, 0], [-1, 0], [0, 1], [0, -1], [1, 1], [1, -1], [-1, 1], [-1, -1]],
        dtype=np.float64,
    )
    _TARGETS = 0.14 * np.array([[1, 0], [0, 1], [-1, 0], [0, -1]], dtype=np.float64)

    def __init__(self, max_episode_steps: int = 100):
        super().__init__("Reacher-v5", 4, lambda *a: None, "mo-reacher-v5", max_episode_steps)
        from .base import Discrete

        self._obs_dim = 6
        self.observation_space = Box(low=tuple(np.full(6, -np.inf)), high=tuple(np.full(6, np.inf)))
        self.action_space = Discrete(9)

    def _reacher_obs(self, env) -> np.ndarray:
        qpos = env.unwrapped.data.qpos
        qvel = env.unwrapped.data.qvel
        return np.array(
            [
                np.cos(qpos[0]),
                np.cos(qpos[1]),
                np.sin(qpos[0]),
                np.sin(qpos[1]),
                qvel[0],
                qvel[1],
            ],
            dtype=np.float32,
        )

    def _host_reset_slot(self, slot, seed) -> np.ndarray:
        env = self._pool.env(int(slot))
        env.reset(seed=int(np.asarray(seed)) % (2**31 - 1))
        return self._reacher_obs(env)

    def _host_reset(self, seed):
        slot = self._pool.alloc()
        return np.int32(slot), self._host_reset_slot(slot, seed)

    def _host_step(self, slot, action):
        env = self._pool.env(int(slot))
        torque = self._TORQUES[int(np.asarray(action))]
        env.step(torque)
        tip = env.unwrapped.get_body_com("fingertip")[:2]
        dists = np.linalg.norm(self._TARGETS - tip[None, :], axis=1)
        mo_r = (1.0 - 4.0 * dists).astype(np.float32)
        return self._reacher_obs(env), mo_r, np.bool_(False), np.bool_(False)

    def _device_action(self, action) -> jnp.ndarray:
        return jnp.asarray(action, dtype=jnp.int32).reshape(())

    def _device_vector_actions(self, actions, n) -> jnp.ndarray:
        return jnp.asarray(actions, dtype=jnp.int32).reshape(n)


def make_mo_reacher(max_episode_steps: int = 100) -> MOReacher:
    return MOReacher(max_episode_steps)


def make_mo_hopper(max_episode_steps: int = 1000) -> MOMuJoCoEnv:
    return MOMuJoCoEnv("Hopper-v5", 3, _hopper_mo_reward, "mo-hopper-v5", max_episode_steps)


def make_mo_halfcheetah(max_episode_steps: int = 1000) -> MOMuJoCoEnv:
    return MOMuJoCoEnv("HalfCheetah-v5", 2, _halfcheetah_mo_reward, "mo-halfcheetah-v5", max_episode_steps)
