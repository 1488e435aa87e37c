"""MOPPO — multi-objective PPO with a vector-valued critic, fully jitted.

TPU-native re-design of reference single_policy/ser/mo_ppo.py:22-613
(CleanRL-style PPO used as PGMORL's worker):

- Critic V(s) -> R^d; GAE computed *per objective*, then advantages
  scalarized adv@w (reference :433-476).
- Gaussian actor with state-independent log-std; PPO clip + vector value
  MSE + entropy bonus (reference :493-560).
- ``change_weights`` for PGMORL's evolutionary reassignment (reference :343,
  :572-576); obs/reward normalization as functional wrapper state (the
  reference's make_env wrapper stack, :107-145).

One ``train_iteration`` = rollout-scan (T x N envs) + GAE + epochs x
minibatch updates, a single jitted program.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..envs.base import Box, MOEnv
from ..envs.vector import EpisodeStats, RewardNormState, VectorMOEnv, normalize_reward
from ..evaluation.evaluation import policy_evaluation
from ..models.networks import MLP, TrainState
from .base import MOAgentBase


class ObsNormState(NamedTuple):
    mean: jnp.ndarray
    var: jnp.ndarray
    count: jnp.ndarray

    @staticmethod
    def create(obs_dim: int) -> "ObsNormState":
        return ObsNormState(jnp.zeros((obs_dim,)), jnp.ones((obs_dim,)), jnp.asarray(1e-4))


def update_obs_norm(s: ObsNormState, obs: jnp.ndarray):
    bm, bv, bc = jnp.mean(obs, 0), jnp.var(obs, 0), obs.shape[0]
    delta = bm - s.mean
    tot = s.count + bc
    mean = s.mean + delta * bc / tot
    m2 = s.var * s.count + bv * bc + delta**2 * s.count * bc / tot
    return ObsNormState(mean, m2 / tot, tot)


class MOPPONet(nn.Module):
    """Actor (Gaussian or categorical) + vector critic (reference :147-230)."""

    action_dim: int
    reward_dim: int
    continuous: bool
    hidden: tuple = (64, 64)

    @nn.compact
    def __call__(self, obs):
        v = MLP(hidden=self.hidden, activation="tanh", output_dim=self.reward_dim)(obs)
        pi = MLP(hidden=self.hidden, activation="tanh", output_dim=self.action_dim)(obs)
        if self.continuous:
            log_std = self.param("log_std", nn.initializers.zeros, (self.action_dim,))
            return pi, log_std, v
        return pi, None, v


def vector_gae(v_t, rew_t, done_t, last_v, gamma: float, gae_lambda: float):
    """Per-objective GAE over a (T, N, d) rollout (reference mo_ppo.py:433-476,
    CleanRL ppo.py semantics).

    The boundary mask is each transition's OWN done flag: ``delta_t = r_t +
    gamma * V(s_{t+1}) * (1 - done_t) - V(s_t)`` and the advantage chain also
    cuts at done_t.  (Masking with the NEXT step's done — the r1-r4 bug —
    bootstrapped terminal steps into the next episode's reset value and
    zeroed the step before the terminal, corrupting value targets at every
    episode boundary; fatal on short-episode envs.)
    """

    def gae_step(carry, xs):
        adv_next, v_next = carry
        v, r, done = xs
        nonterm = (1.0 - done)[:, None]
        delta = r + gamma * v_next * nonterm - v
        adv = delta + gamma * gae_lambda * nonterm * adv_next
        return (adv, v), adv

    (_, _), adv_t = jax.lax.scan(
        gae_step,
        (jnp.zeros_like(last_v), last_v),
        (v_t, rew_t, done_t),
        reverse=True,
    )
    return adv_t


@dataclass(frozen=True)
class MOPPOConfig:
    learning_rate: float = 3e-4
    gamma: float = 0.995
    gae_lambda: float = 0.95
    clip_coef: float = 0.2
    ent_coef: float = 0.0
    vf_coef: float = 0.5
    max_grad_norm: float = 0.5
    num_envs: int = 4
    steps_per_iteration: int = 2048
    update_epochs: int = 10
    num_minibatches: int = 32
    norm_adv: bool = True
    clip_vloss: bool = True
    anneal_lr: bool = False
    normalize_obs: bool = True
    normalize_reward: bool = True
    hidden: tuple = (64, 64)
    seed: int = 0


class MOPPOState(NamedTuple):
    ts: TrainState
    env_state: tuple
    obs: jnp.ndarray  # raw obs
    obs_norm: ObsNormState
    rew_norm: RewardNormState
    stats: EpisodeStats
    key: jax.Array
    global_step: jnp.ndarray


class MOPPO(MOAgentBase):
    def __init__(self, env: MOEnv, weights: np.ndarray, config: MOPPOConfig = MOPPOConfig(), log: bool = False):
        super().__init__(env, config, log=log)
        self.cfg = config
        self.w = jnp.asarray(weights, dtype=jnp.float32)
        self.continuous = isinstance(env.action_space, Box)
        self.action_dim = env.action_dim if self.continuous else env.num_actions
        self.venv = VectorMOEnv(env, config.num_envs)
        self.net = MOPPONet(
            action_dim=self.action_dim,
            reward_dim=env.reward_dim,
            continuous=self.continuous,
            hidden=config.hidden,
        )
        # one tx instance so states from repeated init_state calls share
        # identical TrainState aux data and stack under tree.map (PGMORL
        # vectorized population)
        self.tx = optax.chain(
            optax.clip_by_global_norm(config.max_grad_norm), optax.adam(config.learning_rate, eps=1e-5)
        )

    def change_weights(self, weights: np.ndarray) -> None:
        """PGMORL weight reassignment (reference :572-576)."""
        self.w = jnp.asarray(weights, dtype=jnp.float32)

    def init_state(self, key: jax.Array | None = None) -> MOPPOState:
        cfg = self.cfg
        key = key if key is not None else jax.random.key(cfg.seed)
        kp, ke, key = jax.random.split(key, 3)
        params = self.net.init(kp, jnp.zeros((1, self.obs_dim)))
        ts = TrainState.create(apply_fn=self.net.apply, params=params, tx=self.tx)
        env_state, obs = self.venv.reset(ke)
        return MOPPOState(
            ts=ts,
            env_state=env_state,
            obs=obs,
            obs_norm=ObsNormState.create(self.obs_dim),
            rew_norm=RewardNormState.create(cfg.num_envs, self.reward_dim),
            stats=EpisodeStats.create(cfg.num_envs, self.reward_dim),
            key=key,
            global_step=jnp.int32(0),
        )

    def _norm_obs(self, obs_norm: ObsNormState, obs):
        if not self.cfg.normalize_obs:
            return obs
        return jnp.clip((obs - obs_norm.mean) / jnp.sqrt(obs_norm.var + 1e-8), -10.0, 10.0)

    def _dist(self, params, obs, key):
        pi, log_std, v = self.net.apply(params, obs)
        if self.continuous:
            std = jnp.exp(log_std)
            a = pi + std * jax.random.normal(key, pi.shape)
            logp = jnp.sum(-0.5 * ((a - pi) / std) ** 2 - log_std - 0.5 * jnp.log(2 * jnp.pi), axis=-1)
            return a, logp, v
        logp_all = jax.nn.log_softmax(pi)
        a = jax.random.categorical(key, pi)
        logp = jnp.take_along_axis(logp_all, a[:, None], axis=1).squeeze(1)
        return a, logp, v

    def _logp_entropy(self, params, obs, actions):
        pi, log_std, v = self.net.apply(params, obs)
        if self.continuous:
            std = jnp.exp(log_std)
            logp = jnp.sum(-0.5 * ((actions - pi) / std) ** 2 - log_std - 0.5 * jnp.log(2 * jnp.pi), axis=-1)
            ent = jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e), axis=-1) * jnp.ones(actions.shape[0])
            return logp, ent, v
        logp_all = jax.nn.log_softmax(pi)
        probs = jax.nn.softmax(pi)
        logp = jnp.take_along_axis(logp_all, actions[:, None].astype(jnp.int32), axis=1).squeeze(1)
        ent = -jnp.sum(probs * logp_all, axis=-1)
        return logp, ent, v

    @partial(jax.jit, static_argnums=(0,))
    def train_iteration(self, state: MOPPOState, w: jnp.ndarray):
        """One PPO iteration: rollout + GAE + clipped updates (reference :580-613)."""
        cfg = self.cfg
        T, N = cfg.steps_per_iteration // cfg.num_envs, cfg.num_envs

        def rollout_step(carry, _):
            s = carry
            key, ka, ks = jax.random.split(s.key, 3)
            nobs = self._norm_obs(s.obs_norm, s.obs)
            a, logp, v = self._dist(s.ts.params, nobs, ka)
            act_env = jnp.clip(a, -1.0, 1.0) if self.continuous else a
            out = self.venv.step(s.env_state, act_env, ks)
            done = out.terminated | out.truncated
            stats, _ = s.stats.update(out.reward, done, cfg.gamma)
            rew_norm, r_train = (
                normalize_reward(s.rew_norm, out.reward, done, cfg.gamma, clip=10.0)
                if cfg.normalize_reward
                else (s.rew_norm, out.reward)
            )
            obs_norm = update_obs_norm(s.obs_norm, s.obs) if cfg.normalize_obs else s.obs_norm
            ns = s._replace(
                env_state=out.state,
                obs=out.obs,
                obs_norm=obs_norm,
                rew_norm=rew_norm,
                stats=stats,
                key=key,
                global_step=s.global_step + N,
            )
            rec = (nobs, a, logp, v, r_train, out.terminated.astype(jnp.float32), done.astype(jnp.float32))
            return ns, rec

        state, (obs_t, act_t, logp_t, v_t, rew_t, term_t, done_t) = jax.lax.scan(
            rollout_step, state, None, length=T
        )

        # bootstrap + per-objective GAE (reference :433-476)
        last_nobs = self._norm_obs(state.obs_norm, state.obs)
        _, _, last_v = self.net.apply(state.ts.params, last_nobs)

        adv_t = vector_gae(v_t, rew_t, done_t, last_v, cfg.gamma, cfg.gae_lambda)
        returns_t = adv_t + v_t

        # flatten batch
        b_obs = obs_t.reshape(-1, self.obs_dim)
        b_act = act_t.reshape((-1, self.action_dim) if self.continuous else (-1,))
        b_logp = logp_t.reshape(-1)
        b_adv_vec = adv_t.reshape(-1, self.reward_dim)
        b_ret = returns_t.reshape(-1, self.reward_dim)
        b_val = v_t.reshape(-1, self.reward_dim)
        b_adv = b_adv_vec @ w  # scalarized advantage

        B = b_obs.shape[0]
        mb = B // cfg.num_minibatches

        def epoch(ts, k):
            perm = jax.random.permutation(k, B)

            def minibatch(ts, i):
                idx = jax.lax.dynamic_slice_in_dim(perm, i * mb, mb)
                mb_adv = b_adv[idx]
                if cfg.norm_adv:
                    mb_adv = (mb_adv - jnp.mean(mb_adv)) / (jnp.std(mb_adv) + 1e-8)

                def loss_fn(params):
                    logp, ent, v = self._logp_entropy(params, b_obs[idx], b_act[idx])
                    ratio = jnp.exp(logp - b_logp[idx])
                    pg1 = -mb_adv * ratio
                    pg2 = -mb_adv * jnp.clip(ratio, 1 - cfg.clip_coef, 1 + cfg.clip_coef)
                    pg_loss = jnp.mean(jnp.maximum(pg1, pg2))
                    if cfg.clip_vloss:
                        v_clip = b_val[idx] + jnp.clip(v - b_val[idx], -cfg.clip_coef, cfg.clip_coef)
                        v_loss = 0.5 * jnp.mean(
                            jnp.maximum((v - b_ret[idx]) ** 2, (v_clip - b_ret[idx]) ** 2)
                        )
                    else:
                        v_loss = 0.5 * jnp.mean((v - b_ret[idx]) ** 2)
                    return pg_loss - cfg.ent_coef * jnp.mean(ent) + cfg.vf_coef * v_loss

                loss, grads = jax.value_and_grad(loss_fn)(ts.params)
                return ts.apply_gradients(grads=grads), loss

            ts, losses = jax.lax.scan(minibatch, ts, jnp.arange(cfg.num_minibatches))
            return ts, jnp.mean(losses)

        ts, losses = jax.lax.scan(epoch, state.ts, jax.random.split(state.key, cfg.update_epochs))
        return state._replace(ts=ts), jnp.mean(losses)

    # ------------------------------------------------------------------ eval

    def act_eval(self, params, obs_norm, obs, w=None, key=None):
        nobs = self._norm_obs(obs_norm, obs[None])
        pi, log_std, _ = self.net.apply(params, nobs)
        if self.continuous:
            return jnp.clip(pi[0], -1.0, 1.0)
        return jnp.argmax(pi[0])

    @partial(jax.jit, static_argnums=(0, 3, 5))
    def policy_eval(self, state: MOPPOState, key, rep: int = 5, w=None, max_steps: int | None = None):
        act = lambda obs, w_, k: self.act_eval(state.ts.params, state.obs_norm, obs)
        w = self.w if w is None else w
        return policy_evaluation(self.env, act, w, key, rep=rep, gamma=self.cfg.gamma, max_steps=max_steps)

    def train(self, total_timesteps: int, state: MOPPOState | None = None) -> MOPPOState:
        cfg = self.cfg
        state = state if state is not None else self.init_state()
        n_iters = max(1, total_timesteps // cfg.steps_per_iteration)
        for _ in range(n_iters):
            state, loss = self.train_iteration(state, self.w)
        return state
