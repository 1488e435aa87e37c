"""Observation wrappers — pure-functional counterparts of the reference's
env-specific wrapper stacks (experiments/benchmark/launch_experiment.py:147-181):

  highway: FlattenObservation
  mario:   MOMaxAndSkipObservation(4) -> ResizeObservation(84,84)
           -> GrayscaleObservation -> FrameStackObservation(4) -> TimeLimit(1000)

On TPU the whole stack lives *inside* the jitted env step: wrapper state is an
extra pytree layer around the inner env state (frame rings, step counters),
image ops are jnp/`jax.image` so thousands of wrapped envs step under `vmap`
with zero host round-trips.  The gym wrappers mutate python objects; these
compose pure `reset`/`step` functions.

Wrappers compose with any pure-JAX MOEnv (not the host-pool MuJoCo adapter,
which bypasses per-env vmap via `vector_step`).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import ArrayBox, Box, MOEnv, StepOut


class _Wrapper(MOEnv):
    """Delegating base: forwards spaces/metadata, subclasses override obs/step."""

    def __init__(self, env: MOEnv):
        self.env = env
        self.observation_space = env.observation_space
        self.action_space = env.action_space
        self.reward_dim = env.reward_dim
        self.max_episode_steps = env.max_episode_steps
        self.name = env.name
        self.num_states = env.num_states

    def state_index(self, obs):
        return self.env.state_index(obs)

    def pareto_front(self, gamma: float):
        return self.env.pareto_front(gamma)


# ---------------------------------------------------------------------------
# Stateless observation transforms
# ---------------------------------------------------------------------------


class _ObsMapWrapper(_Wrapper):
    """Applies a pure function to every observation (reset and step)."""

    def _map(self, obs: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def reset(self, key: jax.Array):
        state, obs = self.env.reset(key)
        return state, self._map(obs)

    def step(self, state, action, key: jax.Array) -> StepOut:
        out = self.env.step(state, action, key)
        return out._replace(obs=self._map(out.obs))


class FlattenObservation(_ObsMapWrapper):
    """gymnasium.wrappers.FlattenObservation (reference uses it for highway,
    launch_experiment.py:155-157)."""

    def __init__(self, env: MOEnv):
        super().__init__(env)
        shape = env.observation_space.shape
        n = int(np.prod(shape))
        sp = env.observation_space
        if isinstance(sp, ArrayBox):
            self.observation_space = Box(low=(float(sp.low),) * n, high=(float(sp.high),) * n)
        else:
            lo = np.broadcast_to(np.asarray(sp.low, dtype=np.float64).ravel(), (n,))
            hi = np.broadcast_to(np.asarray(sp.high, dtype=np.float64).ravel(), (n,))
            self.observation_space = Box(low=tuple(lo), high=tuple(hi))

    def _map(self, obs):
        return obs.reshape((-1,)).astype(jnp.float32)


class GrayscaleObservation(_ObsMapWrapper):
    """(H, W, 3) uint8 -> (H, W) uint8 via ITU-R 601 luma (gymnasium semantics)."""

    _LUMA = (0.2989, 0.5870, 0.1140)

    def __init__(self, env: MOEnv):
        super().__init__(env)
        h, w = env.observation_space.shape[:2]
        self.observation_space = ArrayBox(0, 255, (h, w))

    def _map(self, obs):
        y = jnp.tensordot(obs.astype(jnp.float32), jnp.asarray(self._LUMA), axes=([-1], [0]))
        return jnp.clip(jnp.round(y), 0, 255).astype(jnp.uint8)


class ResizeObservation(_ObsMapWrapper):
    """Bilinear resize of (H, W[, C]) image obs to ``shape`` (uint8 out)."""

    def __init__(self, env: MOEnv, shape: Tuple[int, int] = (84, 84)):
        super().__init__(env)
        self._hw = tuple(shape)
        rest = env.observation_space.shape[2:]
        self.observation_space = ArrayBox(0, 255, self._hw + tuple(rest))

    def _map(self, obs):
        out_shape = self._hw + obs.shape[2:]
        y = jax.image.resize(obs.astype(jnp.float32), out_shape, method="bilinear")
        return jnp.clip(jnp.round(y), 0, 255).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# Stateful wrappers
# ---------------------------------------------------------------------------


class FrameStackState(NamedTuple):
    inner: Any
    frames: jnp.ndarray  # (k, *frame_shape)


class FrameStackObservation(_Wrapper):
    """Stack the last k observations along a new leading axis (gymnasium
    FrameStackObservation with reset-frame padding)."""

    def __init__(self, env: MOEnv, num_stack: int = 4):
        super().__init__(env)
        self.num_stack = num_stack
        sp = env.observation_space
        lo = sp.low if np.isscalar(sp.low) else float(np.min(sp.low))
        hi = sp.high if np.isscalar(sp.high) else float(np.max(sp.high))
        self.observation_space = ArrayBox(lo, hi, (num_stack, *sp.shape))

    def reset(self, key: jax.Array):
        inner, obs = self.env.reset(key)
        frames = jnp.repeat(obs[None], self.num_stack, axis=0)
        return FrameStackState(inner, frames), frames

    def step(self, state: FrameStackState, action, key: jax.Array) -> StepOut:
        out = self.env.step(state.inner, action, key)
        frames = jnp.concatenate([state.frames[1:], out.obs[None]], axis=0)
        return StepOut(FrameStackState(out.state, frames), frames, out.reward, out.terminated, out.truncated)


class MOMaxAndSkipObservation(_Wrapper):
    """Repeat the action ``skip`` times, sum the vector rewards, return the
    elementwise max of the last two frames (mo_gymnasium.wrappers
    MOMaxAndSkipObservation).  Sub-steps after termination are masked no-ops
    (the gym wrapper breaks out of its python loop; under jit we freeze the
    state instead)."""

    def __init__(self, env: MOEnv, skip: int = 4):
        super().__init__(env)
        self.skip = skip

    def reset(self, key: jax.Array):
        return self.env.reset(key)

    def step(self, state, action, key: jax.Array) -> StepOut:
        keys = jax.random.split(key, self.skip)
        reward = jnp.zeros((self.reward_dim,))
        terminated = jnp.asarray(False)
        truncated = jnp.asarray(False)
        prev_obs = cur_obs = None
        for i in range(self.skip):  # static unroll; `skip` is a python int
            out = self.env.step(state, action, keys[i])
            done = terminated | truncated
            alive = ~done
            state = jax.tree.map(lambda new, old: jnp.where(alive, new, old), out.state, state)
            reward = reward + jnp.where(alive, out.reward, 0.0)
            prev_obs = cur_obs
            cur_obs = out.obs if cur_obs is None else jnp.where(alive, out.obs, cur_obs)
            terminated = terminated | out.terminated
            truncated = truncated | out.truncated
        obs = cur_obs if prev_obs is None else jnp.maximum(prev_obs, cur_obs)
        return StepOut(state, obs, reward, terminated, truncated)


class TimeLimitState(NamedTuple):
    inner: Any
    t: jnp.ndarray  # int32


class TimeLimit(_Wrapper):
    """Truncate after ``max_episode_steps`` wrapper-level steps (gymnasium
    TimeLimit; the mario stack caps at 1000, launch_experiment.py:176)."""

    def __init__(self, env: MOEnv, max_episode_steps: int):
        super().__init__(env)
        self.max_episode_steps = max_episode_steps

    def reset(self, key: jax.Array):
        inner, obs = self.env.reset(key)
        return TimeLimitState(inner, jnp.int32(0)), obs

    def step(self, state: TimeLimitState, action, key: jax.Array) -> StepOut:
        out = self.env.step(state.inner, action, key)
        t = state.t + 1
        truncated = out.truncated | (t >= self.max_episode_steps)
        return StepOut(TimeLimitState(out.state, t), out.obs, out.reward, out.terminated, truncated)


def wrap_pixel_stack(env: MOEnv, skip: int = 4, size: Tuple[int, int] = (84, 84),
                     num_stack: int = 4, max_episode_steps: int = 1000, flatten: bool = True) -> MOEnv:
    """The reference's mario CNN stack (launch_experiment.py:158-180), jit-side:
    MaxAndSkip -> Resize -> Grayscale -> FrameStack -> TimeLimit [-> Flatten].

    ``flatten`` keeps the agent interface 1-D (buffers/batches stay (N, D));
    CNN trunks reshape back to (k, H, W) internally (models/networks.py
    NatureCNN via ``image_shape``)."""
    env = MOMaxAndSkipObservation(env, skip=skip)
    env = ResizeObservation(env, size)
    env = GrayscaleObservation(env)
    env = FrameStackObservation(env, num_stack)
    env = TimeLimit(env, max_episode_steps)
    if flatten:
        env = FlattenObservation(env)
    return env
