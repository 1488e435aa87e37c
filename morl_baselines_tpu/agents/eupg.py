"""EUPG — Expected Utility Policy Gradient (ESR criterion), vectorized on device.

TPU-native re-design of reference single_policy/esr/eupg.py:22-398 (Roijers
et al., 2018): REINFORCE with a policy conditioned on the *accrued reward*
(the ESR state), loss -E[log pi(a|s, R_acc) * u(discounted forward rewards)]
with an arbitrary (possibly non-linear) utility u (reference :237-251), and
per-episode on-policy updates (reference :360-363).

Re-design: instead of one env stepping to episode end then updating, N envs
collect a fixed-length on-policy chunk under one scan (chunk >= max episode
length); forward discounted reward-to-go is computed by a reverse scan that
resets at episode boundaries; the policy-gradient update runs over all steps
of *completed* episodes in the chunk (incomplete tails are masked out, which
reproduces the reference's episode-aligned updates).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..envs.base import MOEnv
from ..envs.vector import EpisodeStats, VectorMOEnv
from ..models.networks import MLP, TrainState
from .base import MOAgentBase
import flax.linen as nn


class PolicyNet(nn.Module):
    """pi(a | s, accrued_reward): categorical over actions (reference eupg.py:33-76)."""

    num_actions: int
    hidden: tuple = (64, 64)

    @nn.compact
    def __call__(self, obs, accrued):
        x = jnp.concatenate([obs, accrued], axis=-1)
        x = MLP(hidden=self.hidden, activation="tanh", final_activation=True)(x)
        return nn.Dense(self.num_actions)(x)  # logits


@dataclass(frozen=True)
class EUPGConfig:
    learning_rate: float = 1e-3
    gamma: float = 0.99
    num_envs: int = 16
    chunk_len: int = 200  # >= env max episode length for unbiased episode updates
    hidden: tuple = (64, 64)
    seed: int = 0


class EUPGState(NamedTuple):
    ts: TrainState
    env_state: tuple
    obs: jnp.ndarray
    accrued: jnp.ndarray  # (N, d)
    stats: EpisodeStats
    key: jax.Array
    global_step: jnp.ndarray


class EUPG(MOAgentBase):
    def __init__(
        self,
        env: MOEnv,
        scalarization: Callable[[jnp.ndarray], jnp.ndarray],
        weights: np.ndarray | None = None,
        config: EUPGConfig = EUPGConfig(),
        log: bool = False,
    ):
        super().__init__(env, config, log=log)
        self.cfg = config
        self.u = scalarization  # u(vec_return) -> scalar, batched over leading dims
        self.w = jnp.asarray(weights) if weights is not None else jnp.ones(env.reward_dim)
        self.venv = VectorMOEnv(env, config.num_envs)
        self.net = PolicyNet(num_actions=env.num_actions, hidden=config.hidden)

    def init_state(self, key: jax.Array | None = None) -> EUPGState:
        cfg = self.cfg
        key = key if key is not None else jax.random.key(cfg.seed)
        kp, ke, key = jax.random.split(key, 3)
        params = self.net.init(kp, jnp.zeros((1, self.obs_dim)), jnp.zeros((1, self.reward_dim)))
        ts = TrainState.create(apply_fn=self.net.apply, params=params, tx=optax.adam(cfg.learning_rate))
        env_state, obs = self.venv.reset(ke)
        return EUPGState(
            ts=ts,
            env_state=env_state,
            obs=obs,
            accrued=jnp.zeros((cfg.num_envs, self.reward_dim)),
            stats=EpisodeStats.create(cfg.num_envs, self.reward_dim),
            key=key,
            global_step=jnp.int32(0),
        )

    @partial(jax.jit, static_argnums=(0,))
    def train_segment(self, state: EUPGState):
        """Collect one on-policy chunk and apply one REINFORCE update."""
        cfg = self.cfg

        def step(carry, _):
            s = carry
            key, ka, ks = jax.random.split(s.key, 3)
            logits = self.net.apply(s.ts.params, s.obs, s.accrued)
            actions = jax.random.categorical(ka, logits)
            out = self.venv.step(s.env_state, actions, ks)
            done = out.terminated | out.truncated
            stats, _ = s.stats.update(out.reward, done, cfg.gamma)
            accrued_next = jnp.where(done[:, None], 0.0, s.accrued + out.reward)
            ns = s._replace(
                env_state=out.state,
                obs=out.obs,
                accrued=accrued_next,
                stats=stats,
                key=key,
                global_step=s.global_step + cfg.num_envs,
            )
            tr = (s.obs, s.accrued, actions, out.reward, done)
            return ns, tr

        state, (obs_t, acc_t, act_t, rew_t, done_t) = jax.lax.scan(
            step, state, None, length=cfg.chunk_len
        )  # each (T, N, ...)

        # forward discounted reward-to-go within episodes (reference :263-271)
        def rev(carry, xs):
            rtg = carry
            r, d = xs
            rtg = r + cfg.gamma * rtg * (1.0 - d[:, None])
            return rtg, rtg

        _, rtg_t = jax.lax.scan(
            rev, jnp.zeros((cfg.num_envs, self.reward_dim)), (rew_t, done_t.astype(jnp.float32)), reverse=True
        )
        # mask: step is part of an episode completed within this chunk
        completed = jax.lax.cummax(done_t.astype(jnp.float32), axis=0, reverse=True)

        utilities = self.u(rtg_t)  # (T, N)

        def loss_fn(params):
            logits = self.net.apply(params, obs_t, acc_t)  # (T, N, A)
            logp = jax.nn.log_softmax(logits)
            lp_a = jnp.take_along_axis(logp, act_t[..., None], axis=-1).squeeze(-1)
            return -jnp.sum(lp_a * utilities * completed) / jnp.maximum(jnp.sum(completed), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(state.ts.params)
        ts = state.ts.apply_gradients(grads=grads)
        return state._replace(ts=ts), loss

    # ------------------------------------------------------------------ eval

    def act_eval(self, params, obs, accrued, key):
        logits = self.net.apply(params, obs[None], accrued[None])[0]
        return jnp.argmax(logits)

    @partial(jax.jit, static_argnums=(0, 3))
    def _eval_esr(self, params, key, rep: int = 5):
        """ESR eval: rollout conditioning on accrued reward; returns vec returns.

        Counterpart of reference eval_mo_reward_conditioned (evaluation.py:70).
        """
        env = self.env
        max_steps = env.max_episode_steps or 500

        def one(k):
            k0, krun = jax.random.split(k)
            st, obs = env.reset(k0)

            def body(carry, _):
                st, obs, acc, done, ret, disc, gpow, k = carry
                k, ka, ks = jax.random.split(k, 3)
                a = self.act_eval(params, obs, acc, ka)
                out = env.step(st, a, ks)
                live = 1.0 - done
                ret = ret + live * out.reward
                disc = disc + live * gpow * out.reward
                gpow = jnp.where(done > 0, gpow, gpow * self.cfg.gamma)
                acc = acc + live * out.reward
                done = jnp.maximum(done, (out.terminated | out.truncated).astype(jnp.float32))
                return (out.state, out.obs, acc, done, ret, disc, gpow, k), None

            d = self.reward_dim
            init = (st, obs, jnp.zeros(d), jnp.float32(0.0), jnp.zeros(d), jnp.zeros(d), jnp.float32(1.0), krun)
            (st, obs, acc, done, ret, disc, gpow, k), _ = jax.lax.scan(body, init, None, length=max_steps)
            return ret, disc

        rets, discs = jax.vmap(one)(jax.random.split(key, rep))
        return jnp.mean(rets, 0), jnp.mean(discs, 0)

    def train(self, total_timesteps: int, eval_freq: int = 10_000, state: EUPGState | None = None) -> EUPGState:
        cfg = self.cfg
        state = state if state is not None else self.init_state()
        steps_per_seg = cfg.num_envs * cfg.chunk_len
        n_segs = max(1, total_timesteps // steps_per_seg)
        next_eval = eval_freq
        for i in range(n_segs):
            state, loss = self.train_segment(state)
            gstep = int(state.global_step)
            if gstep >= next_eval:
                next_eval += eval_freq
                ret, disc = self._eval_esr(state.ts.params, jax.random.key(i))
                self.logger.log(
                    {
                        "eval/scalarized_return": float(self.u(jnp.asarray(ret))),
                        "eval/discounted_scalarized_return": float(self.u(jnp.asarray(disc))),
                        "losses/loss": float(loss),
                    },
                    gstep,
                )
                self._last_eval = (np.asarray(ret), np.asarray(disc))
        return state
