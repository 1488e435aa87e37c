"""NL-MOPPO — PPO for non-linear utilities (IPRO's inner oracle), jitted.

TPU-native re-design of reference single_policy/ser/nl_mo_ppo.py:26-489:

- Actor/critic conditioned on obs ⊕ discounted accrued reward ⊕ optional
  preference vector (reference :40-41); vector critic V -> R^d.
- Per-objective GAE (reference :290-309); PPO surrogate per objective, then
  combined with loss weights w = ∂u/∂v evaluated (by jax.grad — the
  reference uses torch autograd, :310-323) at the mean value of the initial
  states.
- Trains against an arbitrary jnp utility ``u_func`` passed to train()
  (reference :444-453) — e.g. IPRO's AASF.

One iteration = rollout scan + GAE + epochs x minibatches, one jit.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..envs.base import MOEnv
from ..envs.vector import EpisodeStats, VectorMOEnv
from ..models.networks import MLP, TrainState
from .base import MOAgentBase
from .moppo import vector_gae


class NLAgentNet(nn.Module):
    """Actor + vector critic over (obs ⊕ accrued ⊕ pref) (reference :40-120)."""

    num_actions: int
    reward_dim: int
    hidden: tuple = (64, 64)

    @nn.compact
    def __call__(self, obs, acc, pref=None):
        parts = [obs, acc] if pref is None else [obs, acc, pref]
        x = jnp.concatenate(parts, axis=-1)
        logits = MLP(hidden=self.hidden, activation="tanh", output_dim=self.num_actions)(x)
        v = MLP(hidden=self.hidden, activation="tanh", output_dim=self.reward_dim)(x)
        return logits, v


@dataclass(frozen=True)
class NLMOPPOConfig:
    learning_rate: float = 3e-4
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_coef: float = 0.2
    ent_coef: float = 0.01
    vf_coef: float = 0.5
    max_grad_norm: float = 0.5
    num_envs: int = 8
    num_steps: int = 256  # rollout length per env
    update_epochs: int = 4
    num_minibatches: int = 4
    norm_adv: bool = True
    clip_vloss: bool = True
    mc_k: int = 32  # init states used to evaluate ∂u/∂v
    hidden: tuple = (64, 64)
    # per-train()-call schedules — each oracle call re-anneals, so a policy
    # warm-started from the previous referent's optimum regains plasticity
    # (the reference anneals lr per call, nl_mo_ppo.py:464-466; the entropy
    # ramp is ours, for depth-cliff envs like DST where the warm-started
    # optimum is a hard local trap)
    anneal_lr: bool = True
    ent_coef_start: float | None = None  # None = constant ent_coef
    # fraction of the call over which the entropy ramp completes; the tail
    # (1 - frac) trains at ent_coef while lr is still non-negligible — a
    # full-call ramp leaves no window to exploit before lr anneals away
    ent_ramp_frac: float = 0.5
    # track the best-utility evaluated iterate across the call and return it
    # instead of the final policy's eval (an approximate Pareto oracle should
    # not forget a better policy it already proved; every returned point is
    # still a real greedy-policy evaluation)
    track_best: bool = True
    eval_reps: int = 5
    seed: int = 0


class NLMOPPOState(NamedTuple):
    ts: TrainState
    env_state: tuple
    obs: jnp.ndarray
    acc: jnp.ndarray  # (N, d) discounted accrued reward
    gamma_pow: jnp.ndarray  # (N,)
    init_obs: jnp.ndarray  # (mc_k, obs_dim) sampled initial states
    stats: EpisodeStats
    key: jax.Array
    global_step: jnp.ndarray


class NLMOPPO(MOAgentBase):
    def __init__(self, env: MOEnv, config: NLMOPPOConfig = NLMOPPOConfig(), log: bool = False):
        super().__init__(env, config, log=log)
        self.cfg = config
        self.venv = VectorMOEnv(env, config.num_envs)
        self.net = NLAgentNet(num_actions=env.num_actions, reward_dim=env.reward_dim, hidden=config.hidden)

    def init_state(self, key: jax.Array | None = None) -> NLMOPPOState:
        cfg = self.cfg
        key = key if key is not None else jax.random.key(cfg.seed)
        kp, ke, ki, key = jax.random.split(key, 4)
        params = self.net.init(kp, jnp.zeros((1, self.obs_dim)), jnp.zeros((1, self.reward_dim)))
        tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), optax.adam(cfg.learning_rate, eps=1e-5))
        ts = TrainState.create(apply_fn=self.net.apply, params=params, tx=tx)
        env_state, obs = self.venv.reset(ke)
        _, init_obs = jax.vmap(self.env.reset)(jax.random.split(ki, cfg.mc_k))
        return NLMOPPOState(
            ts=ts,
            env_state=env_state,
            obs=obs,
            acc=jnp.zeros((cfg.num_envs, self.reward_dim)),
            gamma_pow=jnp.ones((cfg.num_envs,)),
            init_obs=init_obs,
            stats=EpisodeStats.create(cfg.num_envs, self.reward_dim),
            key=key,
            global_step=jnp.int32(0),
        )

    @partial(jax.jit, static_argnums=(0, 2))
    def train_iteration(
        self,
        state: NLMOPPOState,
        u_func: Callable[[jnp.ndarray], jnp.ndarray],
        ent_coef: jnp.ndarray | float | None = None,
        lr_frac: jnp.ndarray | float = 1.0,
    ):
        cfg = self.cfg
        ent_coef = cfg.ent_coef if ent_coef is None else ent_coef
        N, T = cfg.num_envs, cfg.num_steps

        def rollout(carry, _):
            s = carry
            key, ka, ks = jax.random.split(s.key, 3)
            logits, v = self.net.apply(s.ts.params, s.obs, s.acc)
            actions = jax.random.categorical(ka, logits)
            logp = jnp.take_along_axis(jax.nn.log_softmax(logits), actions[:, None], axis=1).squeeze(1)
            out = self.venv.step(s.env_state, actions, ks)
            done = out.terminated | out.truncated
            stats, _ = s.stats.update(out.reward, done, cfg.gamma)
            acc_next = jnp.where(
                done[:, None], 0.0, s.acc + s.gamma_pow[:, None] * out.reward
            )
            gpow_next = jnp.where(done, 1.0, s.gamma_pow * cfg.gamma)
            ns = s._replace(
                env_state=out.state, obs=out.obs, acc=acc_next, gamma_pow=gpow_next,
                stats=stats, key=key, global_step=s.global_step + N,
            )
            rec = (s.obs, s.acc, actions, logp, v, out.reward, out.terminated.astype(jnp.float32), done.astype(jnp.float32))
            return ns, rec

        state, (obs_t, acc_t, act_t, logp_t, v_t, rew_t, term_t, done_t) = jax.lax.scan(
            rollout, state, None, length=T
        )

        _, last_v = self.net.apply(state.ts.params, state.obs, state.acc)

        adv_t = vector_gae(v_t, rew_t, done_t, last_v, cfg.gamma, cfg.gae_lambda)
        ret_t = adv_t + v_t

        # loss weights w = du/dv at mean V(s0) (reference :310-323)
        zero_acc = jnp.zeros((state.init_obs.shape[0], self.reward_dim))
        _, v0 = self.net.apply(state.ts.params, state.init_obs, zero_acc)
        loss_w = jax.grad(lambda v: u_func(v))(jnp.mean(v0, axis=0))

        b_obs = obs_t.reshape(-1, self.obs_dim)
        b_acc = acc_t.reshape(-1, self.reward_dim)
        b_act = act_t.reshape(-1)
        b_logp = logp_t.reshape(-1)
        b_adv = adv_t.reshape(-1, self.reward_dim)
        b_ret = ret_t.reshape(-1, self.reward_dim)
        b_val = v_t.reshape(-1, self.reward_dim)
        B = b_obs.shape[0]
        mb = B // cfg.num_minibatches

        def epoch(ts, k):
            perm = jax.random.permutation(k, B)

            def minibatch(ts, i):
                idx = jax.lax.dynamic_slice_in_dim(perm, i * mb, mb)
                adv_vec = b_adv[idx]
                if cfg.norm_adv:
                    adv_vec = (adv_vec - adv_vec.mean(0, keepdims=True)) / (adv_vec.std(0, keepdims=True) + 1e-8)

                def loss_fn(params):
                    logits, v = self.net.apply(params, b_obs[idx], b_acc[idx])
                    logp_all = jax.nn.log_softmax(logits)
                    logp = jnp.take_along_axis(logp_all, b_act[idx][:, None].astype(jnp.int32), axis=1).squeeze(1)
                    ratio = jnp.exp(logp - b_logp[idx])
                    pg1 = -adv_vec * ratio[:, None]
                    pg2 = -adv_vec * jnp.clip(ratio, 1 - cfg.clip_coef, 1 + cfg.clip_coef)[:, None]
                    per_obj = jnp.mean(jnp.maximum(pg1, pg2), axis=0)  # (d,)
                    pg_loss = jnp.sum(per_obj * loss_w)
                    if cfg.clip_vloss:
                        v_clip = b_val[idx] + jnp.clip(v - b_val[idx], -cfg.clip_coef, cfg.clip_coef)
                        v_loss = 0.5 * jnp.mean(jnp.maximum((v - b_ret[idx]) ** 2, (v_clip - b_ret[idx]) ** 2))
                    else:
                        v_loss = 0.5 * jnp.mean((v - b_ret[idx]) ** 2)
                    probs = jax.nn.softmax(logits)
                    ent = -jnp.mean(jnp.sum(probs * logp_all, axis=-1))
                    return pg_loss - ent_coef * ent + cfg.vf_coef * v_loss

                loss, grads = jax.value_and_grad(loss_fn)(ts.params)
                # lr annealing without rebuilding the optimizer: scale the
                # post-Adam update (equivalent to scaling Adam's lr)
                updates, opt_state = ts.tx.update(grads, ts.opt_state, ts.params)
                updates = jax.tree.map(lambda u: u * lr_frac, updates)
                ts = ts.replace(
                    params=optax.apply_updates(ts.params, updates),
                    opt_state=opt_state,
                    step=ts.step + 1,
                )
                return ts, loss

            ts, losses = jax.lax.scan(minibatch, ts, jnp.arange(cfg.num_minibatches))
            return ts, jnp.mean(losses)

        ts, losses = jax.lax.scan(epoch, state.ts, jax.random.split(state.key, cfg.update_epochs))
        return state._replace(ts=ts), jnp.mean(losses)

    # ------------------------------------------------------------------ eval

    @partial(jax.jit, static_argnums=(0, 3, 4))
    def policy_evaluate(self, state: NLMOPPOState, key, rep: int = 5, max_steps: int | None = None):
        """Mean discounted vector return of the greedy policy (reference :410-443)."""
        env = self.env
        T = max_steps or env.max_episode_steps or 500

        def one(k):
            k0, krun = jax.random.split(k)
            st, obs = env.reset(k0)

            def body(carry, _):
                st, obs, acc, gpow, done, k = carry
                k, ks = jax.random.split(k)
                logits, _ = self.net.apply(state.ts.params, obs[None], acc[None])
                a = jnp.argmax(logits[0])
                out = env.step(st, a, ks)
                live = 1.0 - done
                acc = acc + live * gpow * out.reward
                gpow = jnp.where(done > 0, gpow, gpow * self.cfg.gamma)
                done = jnp.maximum(done, (out.terminated | out.truncated).astype(jnp.float32))
                return (out.state, out.obs, acc, gpow, done, k), None

            init = (st, obs, jnp.zeros(self.reward_dim), jnp.float32(1.0), jnp.float32(0.0), krun)
            (st, obs, acc, gpow, done, k), _ = jax.lax.scan(body, init, None, length=T)
            return acc

        return jnp.mean(jax.vmap(one)(jax.random.split(key, rep)), axis=0)

    def train(
        self,
        total_timesteps: int,
        u_func: Callable[[jnp.ndarray], jnp.ndarray],
        state: NLMOPPOState | None = None,
    ):
        """Train against the non-linear utility; returns (state, pareto_point).

        Per call: lr anneals 1 -> 0 and the entropy coefficient ramps
        ent_coef_start -> ent_coef (when set); with ``track_best`` the
        returned point is the best-by-u evaluated iterate across the call."""
        cfg = self.cfg
        state = state if state is not None else self.init_state()
        per_iter = cfg.num_envs * cfg.num_steps
        n_iters = max(1, total_timesteps // per_iter)
        best_point, best_u = None, -np.inf
        for i in range(n_iters):
            frac = i / max(n_iters - 1, 1)
            lr_frac = 1.0 - i / n_iters if cfg.anneal_lr else 1.0
            ramp = min(frac / max(cfg.ent_ramp_frac, 1e-8), 1.0)
            ent = (
                cfg.ent_coef_start + (cfg.ent_coef - cfg.ent_coef_start) * ramp
                if cfg.ent_coef_start is not None
                else cfg.ent_coef
            )
            state, loss = self.train_iteration(state, u_func, jnp.float32(ent), jnp.float32(lr_frac))
            if cfg.track_best and n_iters > 1:
                pt = self.policy_evaluate(
                    state, jax.random.key(cfg.seed + 7 + i), cfg.eval_reps
                )
                u_val = float(u_func(jnp.asarray(pt)))
                if u_val > best_u:
                    best_u, best_point = u_val, np.asarray(pt)
        point = np.asarray(
            self.policy_evaluate(state, jax.random.key(cfg.seed + 7), cfg.eval_reps)
        )
        if cfg.track_best and best_point is not None and best_u > float(u_func(jnp.asarray(point))):
            point = best_point
        return state, point
