"""Vectorized autoresetting MO envs + functional episode-statistics wrappers.

TPU-native replacement for MO-Gymnasium's ``MOSyncVectorEnv`` /
``MORecordEpisodeStatistics`` / ``MONormalizeReward`` / ``MOClipReward``
(consumed by the reference at single_policy/ser/mo_ppo.py:107-145 and
multi_policy/morld/morld.py:120-121).  Instead of a python loop over
subprocess envs, N env states live on device as a stacked pytree and step
under one ``vmap`` inside jit; autoreset is a ``jnp.where`` select.

Autoreset semantics: *same-step* — when an episode ends, the returned obs is
already the reset obs, and the pre-reset final obs is returned separately so
TD targets can bootstrap correctly (`final_obs` + `terminated`).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from .base import MOEnv


class VecStepOut(NamedTuple):
    state: Any  # stacked env-state pytree
    obs: jnp.ndarray  # (N, obs_dim) — post-autoreset obs
    reward: jnp.ndarray  # (N, d)
    terminated: jnp.ndarray  # (N,)
    truncated: jnp.ndarray  # (N,)
    final_obs: jnp.ndarray  # (N, obs_dim) — pre-reset obs of this step


class VectorMOEnv:
    """N copies of a pure MOEnv stepping under vmap with autoreset."""

    def __init__(self, env: MOEnv, num_envs: int):
        self.env = env
        self.num_envs = num_envs
        self.reward_dim = env.reward_dim

    def reset(self, key: jax.Array):
        if hasattr(self.env, "vector_reset"):
            # Host-pool envs (MuJoCo adapter): one io_callback for the whole
            # batch instead of num_envs per-element callbacks under vmap.
            return self.env.vector_reset(key, self.num_envs)
        keys = jax.random.split(key, self.num_envs)
        state, obs = jax.vmap(self.env.reset)(keys)
        return state, obs

    def step(self, state, actions, key: jax.Array) -> VecStepOut:
        if hasattr(self.env, "vector_step"):
            return self.env.vector_step(state, actions, key)
        n = self.num_envs
        step_keys = jax.random.split(key, 2 * n)
        out = jax.vmap(self.env.step)(state, actions, step_keys[:n])
        done = out.terminated | out.truncated
        reset_state, reset_obs = jax.vmap(self.env.reset)(step_keys[n:])
        # select reset state/obs where done (same-step autoreset)
        new_state = jax.tree.map(
            lambda r, s: jnp.where(done.reshape(done.shape + (1,) * (s.ndim - 1)), r, s),
            reset_state,
            out.state,
        )
        obs = jnp.where(done[:, None], reset_obs, out.obs)
        return VecStepOut(new_state, obs, out.reward, out.terminated, out.truncated, out.obs)


# ---------------------------------------------------------------------------
# Episode statistics (functional MORecordEpisodeStatistics)
# ---------------------------------------------------------------------------


class EpisodeStats(NamedTuple):
    """Per-env episode accumulators; reported rows are only meaningful at done."""

    ret: jnp.ndarray  # (N, d) undiscounted vector return
    disc_ret: jnp.ndarray  # (N, d) discounted vector return
    length: jnp.ndarray  # (N,)
    gamma_pow: jnp.ndarray  # (N,)

    @staticmethod
    def create(num_envs: int, reward_dim: int) -> "EpisodeStats":
        return EpisodeStats(
            ret=jnp.zeros((num_envs, reward_dim)),
            disc_ret=jnp.zeros((num_envs, reward_dim)),
            length=jnp.zeros((num_envs,), dtype=jnp.int32),
            gamma_pow=jnp.ones((num_envs,)),
        )

    def update(self, reward: jnp.ndarray, done: jnp.ndarray, gamma: float):
        """Returns (next_stats, finished: EpisodeStats of rows that just ended).

        ``finished`` holds the completed-episode statistics (the reference's
        info["episode"] dict with r/dr/l keys, evaluation.py:221-277); rows
        where ``done`` is False are zeros.
        """
        ret = self.ret + reward
        disc = self.disc_ret + self.gamma_pow[:, None] * reward
        length = self.length + 1
        finished = EpisodeStats(
            ret=jnp.where(done[:, None], ret, 0.0),
            disc_ret=jnp.where(done[:, None], disc, 0.0),
            length=jnp.where(done, length, 0),
            gamma_pow=jnp.zeros_like(self.gamma_pow),
        )
        nxt = EpisodeStats(
            ret=jnp.where(done[:, None], 0.0, ret),
            disc_ret=jnp.where(done[:, None], 0.0, disc),
            length=jnp.where(done, 0, length),
            gamma_pow=jnp.where(done, 1.0, self.gamma_pow * gamma),
        )
        return nxt, finished


# ---------------------------------------------------------------------------
# Reward normalization / clipping (functional MONormalizeReward / MOClipReward)
# ---------------------------------------------------------------------------


class RewardNormState(NamedTuple):
    """Per-objective running stats of discounted return (gymnasium semantics)."""

    mean: jnp.ndarray  # (d,)
    var: jnp.ndarray  # (d,)
    count: jnp.ndarray  # ()
    returns: jnp.ndarray  # (N, d) discounted return accumulator

    @staticmethod
    def create(num_envs: int, reward_dim: int) -> "RewardNormState":
        return RewardNormState(
            mean=jnp.zeros((reward_dim,)),
            var=jnp.ones((reward_dim,)),
            count=jnp.asarray(1e-4),
            returns=jnp.zeros((num_envs, reward_dim)),
        )


def normalize_reward(
    state: RewardNormState,
    reward: jnp.ndarray,
    done: jnp.ndarray,
    gamma: float,
    eps: float = 1e-8,
    clip: float | None = None,
):
    """Normalize vector rewards by the std of their discounted returns.

    Per-objective version of gymnasium's NormalizeReward, as MO-Gymnasium's
    MONormalizeReward does for one chosen index (reference mo_ppo.py:133-136
    applies it per objective).  Optionally clip (MOClipReward).
    """
    returns = state.returns * gamma * (1.0 - done.astype(jnp.float32))[:, None] + reward
    batch_mean = jnp.mean(returns, axis=0)
    batch_var = jnp.var(returns, axis=0)
    batch_count = returns.shape[0]
    delta = batch_mean - state.mean
    tot = state.count + batch_count
    new_mean = state.mean + delta * batch_count / tot
    m_a = state.var * state.count
    m_b = batch_var * batch_count
    m2 = m_a + m_b + delta**2 * state.count * batch_count / tot
    new_var = m2 / tot
    normed = reward / jnp.sqrt(new_var + eps)
    if clip is not None:
        normed = jnp.clip(normed, -clip, clip)
    return RewardNormState(new_mean, new_var, tot, returns), normed
