"""MOSAC — multi-objective SAC (continuous + discrete), device-resident.

TPU-native re-design of reference single_policy/ser/mosac_continuous_action.py
:28-573 and mosac_discrete_action.py:36-603 (CleanRL-SAC with vector critics):

- Critics Q(s, a) -> R^d (continuous) / Q(s) -> (A, d) (discrete); the
  scalarization u(·, w) with the policy's FIXED weight is applied *before*
  the min over the twin critics (reference continuous :437-448, discrete
  :452-464).
- Squashed-Gaussian actor (continuous) / categorical actor with expectation
  update (discrete); autotuned entropy alpha (target entropy -|A| cont.,
  scale * log|A| disc.).
- ``set_weights`` and buffer injection support MORL/D's population scheme
  (reference morld.py:30-34, shared buffer :245-261).

N envs step under one scanned segment; twin critics are a 2-ensemble
(nn.vmap) so both target evaluations are a single batched GEMM.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..envs.base import Box, MOEnv
from ..envs.vector import EpisodeStats, VectorMOEnv
from ..evaluation.evaluation import policy_evaluation
from ..models.continuous import ContinuousQNet, DiscreteQNet, DiscreteSACActor, SquashedGaussianActor
from ..models.networks import TrainState, ensemble
from ..replay.buffer import ReplayBuffer, Transition
from .base import MOAgentBase


@dataclass(frozen=True)
class MOSACConfig:
    learning_rate: float = 3e-4
    q_learning_rate: float = 1e-3
    gamma: float = 0.99
    tau: float = 0.005
    batch_size: int = 256
    buffer_size: int = 100_000
    num_envs: int = 16
    learning_starts: int = 1000
    policy_freq: int = 2
    target_net_freq: int = 1
    alpha: float = 0.2
    autotune: bool = True
    target_entropy_scale: float = 0.89  # discrete only (reference :36-90)
    hidden: tuple = (256, 256)
    seed: int = 0


class MOSACState(NamedTuple):
    actor_ts: TrainState
    critic_ts: TrainState  # 2-ensemble params; target in .target_params
    log_alpha: jnp.ndarray
    alpha_opt_state: tuple
    env_state: tuple
    obs: jnp.ndarray
    stats: EpisodeStats
    key: jax.Array
    global_step: jnp.ndarray
    iter_count: jnp.ndarray


class MOSAC(MOAgentBase):
    """Continuous-action MOSAC with a fixed scalarization weight."""

    discrete = False

    def __init__(self, env: MOEnv, weights: np.ndarray, config: MOSACConfig = MOSACConfig(), log: bool = False):
        super().__init__(env, config, log=log)
        assert isinstance(env.action_space, Box) != self.discrete
        self.cfg = config
        self.w = jnp.asarray(weights, dtype=jnp.float32)
        self.venv = VectorMOEnv(env, config.num_envs)
        self.action_dim = env.action_dim
        self.actor = SquashedGaussianActor(action_dim=self.action_dim, hidden=config.hidden)
        self.critic = ensemble(ContinuousQNet, 2, reward_dim=env.reward_dim, hidden=config.hidden)
        self.alpha_tx = optax.adam(config.q_learning_rate)
        self.target_entropy = -float(self.action_dim)

    def set_weights(self, weights: np.ndarray) -> None:
        """MORL/D weight adaptation hook (reference morld.py:368-417)."""
        self.w = jnp.asarray(weights, dtype=jnp.float32)

    # ------------------------------------------------------------------ init

    def init_state(self, key: jax.Array | None = None) -> MOSACState:
        cfg = self.cfg
        key = key if key is not None else jax.random.key(cfg.seed)
        ka, kc, ke, key = jax.random.split(key, 4)
        dummy_obs = jnp.zeros((1, self.obs_dim))
        dummy_act = jnp.zeros((1, self.action_dim))
        actor_params = self.actor.init(ka, dummy_obs)
        critic_params = self.critic.init(kc, dummy_obs, dummy_act)
        actor_ts = TrainState.create(
            apply_fn=self.actor.apply, params=actor_params, tx=optax.adam(cfg.learning_rate)
        )
        critic_ts = TrainState.create(
            apply_fn=self.critic.apply,
            params=critic_params,
            target_params=critic_params,
            tx=optax.adam(cfg.q_learning_rate),
        )
        log_alpha = jnp.asarray(np.log(cfg.alpha), dtype=jnp.float32)
        env_state, obs = self.venv.reset(ke)
        return MOSACState(
            actor_ts=actor_ts,
            critic_ts=critic_ts,
            log_alpha=log_alpha,
            alpha_opt_state=self.alpha_tx.init(log_alpha),
            env_state=env_state,
            obs=obs,
            stats=EpisodeStats.create(cfg.num_envs, self.reward_dim),
            key=key,
            global_step=jnp.int32(0),
            iter_count=jnp.int32(0),
        )

    # ---------------------------------------------------------------- update

    def _update(self, s: MOSACState, batch: Transition, key: jax.Array, w: jnp.ndarray) -> MOSACState:
        cfg = self.cfg
        k1, k2, k3 = jax.random.split(key, 3)
        alpha = jnp.exp(s.log_alpha)

        # critic update: scalarize-then-min target (reference :437-448)
        mean, log_std = self.actor.apply(s.actor_ts.params, batch.next_obs)
        next_a, next_logp = SquashedGaussianActor.sample(mean, log_std, k1)
        q_next = self.critic.apply(s.critic_ts.target_params, batch.next_obs, next_a)  # (2, B, d)
        q_next_scal = jnp.einsum("cbd,d->cb", q_next, w)
        min_q_next = jnp.min(q_next_scal, axis=0) - alpha * next_logp
        target = jnp.einsum("bd,d->b", batch.reward, w) + (1.0 - batch.terminated) * cfg.gamma * min_q_next

        def critic_loss_fn(params):
            q = self.critic.apply(params, batch.obs, batch.action)  # (2, B, d)
            q_scal = jnp.einsum("cbd,d->cb", q, w)
            return jnp.mean((q_scal - target[None]) ** 2), q_scal

        (closs, _), cgrads = jax.value_and_grad(critic_loss_fn, has_aux=True)(s.critic_ts.params)
        critic_ts = s.critic_ts.apply_gradients(grads=cgrads)

        # delayed actor + alpha update (reference :450-480)
        def actor_update(args):
            actor_ts, log_alpha, alpha_opt_state = args

            def actor_loss_fn(params):
                mean, log_std = self.actor.apply(params, batch.obs)
                a, logp = SquashedGaussianActor.sample(mean, log_std, k2)
                q = self.critic.apply(critic_ts.params, batch.obs, a)
                q_scal = jnp.einsum("cbd,d->cb", q, w)
                min_q = jnp.min(q_scal, axis=0)
                return jnp.mean(jnp.exp(log_alpha) * logp - min_q), logp

            (aloss, logp), agrads = jax.value_and_grad(actor_loss_fn, has_aux=True)(actor_ts.params)
            actor_ts = actor_ts.apply_gradients(grads=agrads)
            if cfg.autotune:
                def alpha_loss_fn(la):
                    return -jnp.mean(la * (jax.lax.stop_gradient(logp) + self.target_entropy))

                galpha = jax.grad(alpha_loss_fn)(log_alpha)
                updates, alpha_opt_state = self.alpha_tx.update(galpha, alpha_opt_state)
                log_alpha = optax.apply_updates(log_alpha, updates)
            return actor_ts, log_alpha, alpha_opt_state

        actor_ts, log_alpha, alpha_opt_state = jax.lax.cond(
            s.iter_count % cfg.policy_freq == 0,
            actor_update,
            lambda a: a,
            (s.actor_ts, s.log_alpha, s.alpha_opt_state),
        )
        # polyak target update
        critic_ts = critic_ts.replace(
            target_params=optax.incremental_update(critic_ts.params, critic_ts.target_params, cfg.tau)
        )
        return s._replace(
            actor_ts=actor_ts, critic_ts=critic_ts, log_alpha=log_alpha, alpha_opt_state=alpha_opt_state
        )

    @partial(jax.jit, static_argnums=(0,))
    def update_once(self, state: MOSACState, batch: Transition, key: jax.Array, w=None) -> MOSACState:
        """Jitted single off-policy update (MORL/D cooperation passes)."""
        return self._update(state, batch, key, self.w if w is None else w)

    # ---------------------------------------------------------- train segment

    def _policy_actions(self, params, obs, key):
        mean, log_std = self.actor.apply(params, obs)
        a, _ = SquashedGaussianActor.sample(mean, log_std, key)
        return a

    @partial(jax.jit, static_argnums=(0, 3))
    def train_segment(self, state: MOSACState, buffer: ReplayBuffer, num_iters: int, w=None):
        """Scanned act->step->store->update segment; buffer passed separately so
        MORL/D can share one buffer across the population (reference :341-347).

        ``w`` optionally overrides the baked-in scalarization weight as a traced
        array so a whole population can train under one vmap (MORL/D vectorized
        mode)."""
        cfg = self.cfg
        w = self.w if w is None else w

        def body(carry, _):
            s, buffer = carry
            key, k_act, k_step, k_upd, k_rand = jax.random.split(s.key, 5)
            a_pol = self._policy_actions(s.actor_ts.params, s.obs, k_act)
            a_rand = jax.random.uniform(k_rand, a_pol.shape, minval=-1.0, maxval=1.0)
            actions = jnp.where(s.global_step < cfg.learning_starts, a_rand, a_pol)

            out = self.venv.step(s.env_state, actions, k_step)
            done = out.terminated | out.truncated
            stats, _ = s.stats.update(out.reward, done, cfg.gamma)
            buffer = buffer.add_batch(
                Transition(
                    obs=s.obs,
                    action=actions,
                    reward=out.reward,
                    next_obs=out.final_obs,
                    terminated=out.terminated.astype(jnp.float32),
                )
            )
            s = s._replace(
                env_state=out.state,
                obs=out.obs,
                stats=stats,
                key=key,
                global_step=s.global_step + cfg.num_envs,
                iter_count=s.iter_count + 1,
            )
            s = jax.lax.cond(
                s.global_step >= cfg.learning_starts,
                lambda args: self._update(args[0], args[1].sample(k_upd, cfg.batch_size), k_upd, w),
                lambda args: args[0],
                (s, buffer),
            )
            return (s, buffer), None

        (state, buffer), _ = jax.lax.scan(body, (state, buffer), None, length=num_iters)
        return state, buffer

    # ------------------------------------------------------------------ eval

    def act_eval(self, params, obs, w=None, key=None):
        mean, _ = self.actor.apply(params, obs[None])
        return jnp.tanh(mean[0])

    @partial(jax.jit, static_argnums=(0, 3, 5))
    def policy_eval(self, state: MOSACState, key, rep: int = 5, w=None, max_steps: int | None = None):
        act = lambda obs, w_, k: self.act_eval(state.actor_ts.params, obs)
        w = self.w if w is None else w
        return policy_evaluation(self.env, act, w, key, rep=rep, gamma=self.cfg.gamma, max_steps=max_steps)

    def make_buffer(self) -> ReplayBuffer:
        return ReplayBuffer.create(
            self.cfg.buffer_size,
            obs_dim=self.obs_dim,
            action_shape=(self.action_dim,),
            reward_dim=self.reward_dim,
            action_dtype=jnp.float32,
        )

    def train(self, total_timesteps: int, state=None, buffer=None):
        cfg = self.cfg
        state = state if state is not None else self.init_state()
        buffer = buffer if buffer is not None else self.make_buffer()
        iters = max(1, total_timesteps // cfg.num_envs)
        state, buffer = self.train_segment(state, buffer, iters)
        return state, buffer


class MOSACDiscreteState(NamedTuple):
    actor_ts: TrainState
    critic_ts: TrainState
    log_alpha: jnp.ndarray
    alpha_opt_state: tuple
    env_state: tuple
    obs: jnp.ndarray
    stats: EpisodeStats
    key: jax.Array
    global_step: jnp.ndarray
    iter_count: jnp.ndarray


class MOSACDiscrete(MOAgentBase):
    """Discrete-action MOSAC (reference mosac_discrete_action.py:36-603)."""

    def __init__(self, env: MOEnv, weights: np.ndarray, config: MOSACConfig = MOSACConfig(), log: bool = False):
        super().__init__(env, config, log=log)
        self.cfg = config
        self.w = jnp.asarray(weights, dtype=jnp.float32)
        self.venv = VectorMOEnv(env, config.num_envs)
        self.num_actions = env.num_actions
        self.actor = DiscreteSACActor(num_actions=self.num_actions, hidden=config.hidden)
        self.critic = ensemble(
            DiscreteQNet, 2, num_actions=self.num_actions, reward_dim=env.reward_dim, hidden=config.hidden
        )
        self.alpha_tx = optax.adam(config.q_learning_rate)
        self.target_entropy = config.target_entropy_scale * float(np.log(self.num_actions))

    def set_weights(self, weights: np.ndarray) -> None:
        self.w = jnp.asarray(weights, dtype=jnp.float32)

    def init_state(self, key: jax.Array | None = None) -> MOSACDiscreteState:
        cfg = self.cfg
        key = key if key is not None else jax.random.key(cfg.seed)
        ka, kc, ke, key = jax.random.split(key, 4)
        dummy_obs = jnp.zeros((1, self.obs_dim))
        actor_params = self.actor.init(ka, dummy_obs)
        critic_params = self.critic.init(kc, dummy_obs)
        actor_ts = TrainState.create(apply_fn=self.actor.apply, params=actor_params, tx=optax.adam(cfg.learning_rate))
        critic_ts = TrainState.create(
            apply_fn=self.critic.apply, params=critic_params, target_params=critic_params,
            tx=optax.adam(cfg.q_learning_rate),
        )
        log_alpha = jnp.asarray(np.log(cfg.alpha), dtype=jnp.float32)
        env_state, obs = self.venv.reset(ke)
        return MOSACDiscreteState(
            actor_ts=actor_ts,
            critic_ts=critic_ts,
            log_alpha=log_alpha,
            alpha_opt_state=self.alpha_tx.init(log_alpha),
            env_state=env_state,
            obs=obs,
            stats=EpisodeStats.create(cfg.num_envs, self.reward_dim),
            key=key,
            global_step=jnp.int32(0),
            iter_count=jnp.int32(0),
        )

    def _update(self, s: MOSACDiscreteState, batch: Transition, key: jax.Array, w: jnp.ndarray) -> MOSACDiscreteState:
        """Expectation-based discrete SAC update (reference :452-510)."""
        cfg = self.cfg
        alpha = jnp.exp(s.log_alpha)
        logits_next = self.actor.apply(s.actor_ts.params, batch.next_obs)
        probs_next = jax.nn.softmax(logits_next)
        logp_next = jax.nn.log_softmax(logits_next)
        q_next = self.critic.apply(s.critic_ts.target_params, batch.next_obs)  # (2, B, A, d)
        q_next_scal = jnp.einsum("cbad,d->cba", q_next, w)
        min_q_next = jnp.min(q_next_scal, axis=0)
        v_next = jnp.sum(probs_next * (min_q_next - alpha * logp_next), axis=-1)
        target = jnp.einsum("bd,d->b", batch.reward, w) + (1.0 - batch.terminated) * cfg.gamma * v_next

        def critic_loss_fn(params):
            q = self.critic.apply(params, batch.obs)  # (2, B, A, d)
            q_scal = jnp.einsum("cbad,d->cba", q, w)
            q_sa = jnp.take_along_axis(q_scal, batch.action[None, :, None].astype(jnp.int32), axis=2).squeeze(2)
            return jnp.mean((q_sa - target[None]) ** 2)

        closs, cgrads = jax.value_and_grad(critic_loss_fn)(s.critic_ts.params)
        critic_ts = s.critic_ts.apply_gradients(grads=cgrads)

        def actor_update(args):
            actor_ts, log_alpha, alpha_opt_state = args

            def actor_loss_fn(params):
                logits = self.actor.apply(params, batch.obs)
                probs = jax.nn.softmax(logits)
                logp = jax.nn.log_softmax(logits)
                q = self.critic.apply(critic_ts.params, batch.obs)
                q_scal = jnp.min(jnp.einsum("cbad,d->cba", q, w), axis=0)
                loss = jnp.mean(jnp.sum(probs * (jnp.exp(log_alpha) * logp - q_scal), axis=-1))
                ent = -jnp.sum(probs * logp, axis=-1)
                return loss, ent

            (aloss, ent), agrads = jax.value_and_grad(actor_loss_fn, has_aux=True)(actor_ts.params)
            actor_ts = actor_ts.apply_gradients(grads=agrads)
            if cfg.autotune:
                def alpha_loss_fn(la):
                    return jnp.mean(la * (jax.lax.stop_gradient(ent) - self.target_entropy))

                galpha = jax.grad(alpha_loss_fn)(log_alpha)
                updates, alpha_opt_state = self.alpha_tx.update(galpha, alpha_opt_state)
                log_alpha = optax.apply_updates(log_alpha, updates)
            return actor_ts, log_alpha, alpha_opt_state

        actor_ts, log_alpha, alpha_opt_state = jax.lax.cond(
            s.iter_count % cfg.policy_freq == 0, actor_update, lambda a: a,
            (s.actor_ts, s.log_alpha, s.alpha_opt_state),
        )
        critic_ts = critic_ts.replace(
            target_params=optax.incremental_update(critic_ts.params, critic_ts.target_params, cfg.tau)
        )
        return s._replace(actor_ts=actor_ts, critic_ts=critic_ts, log_alpha=log_alpha, alpha_opt_state=alpha_opt_state)

    @partial(jax.jit, static_argnums=(0,))
    def update_once(self, state: MOSACDiscreteState, batch: Transition, key: jax.Array, w=None) -> MOSACDiscreteState:
        """Jitted single off-policy update (MORL/D cooperation passes)."""
        return self._update(state, batch, key, self.w if w is None else w)

    @partial(jax.jit, static_argnums=(0, 3))
    def train_segment(self, state: MOSACDiscreteState, buffer: ReplayBuffer, num_iters: int, w=None):
        cfg = self.cfg
        w = self.w if w is None else w

        def body(carry, _):
            s, buffer = carry
            key, k_act, k_step, k_upd = jax.random.split(s.key, 4)
            logits = self.actor.apply(s.actor_ts.params, s.obs)
            actions = jax.random.categorical(k_act, logits)
            out = self.venv.step(s.env_state, actions, k_step)
            done = out.terminated | out.truncated
            stats, _ = s.stats.update(out.reward, done, cfg.gamma)
            buffer = buffer.add_batch(
                Transition(
                    obs=s.obs,
                    action=actions,
                    reward=out.reward,
                    next_obs=out.final_obs,
                    terminated=out.terminated.astype(jnp.float32),
                )
            )
            s = s._replace(
                env_state=out.state, obs=out.obs, stats=stats, key=key,
                global_step=s.global_step + cfg.num_envs, iter_count=s.iter_count + 1,
            )
            s = jax.lax.cond(
                s.global_step >= cfg.learning_starts,
                lambda args: self._update(args[0], args[1].sample(k_upd, cfg.batch_size), k_upd, w),
                lambda args: args[0],
                (s, buffer),
            )
            return (s, buffer), None

        (state, buffer), _ = jax.lax.scan(body, (state, buffer), None, length=num_iters)
        return state, buffer

    def act_eval(self, params, obs, w=None, key=None):
        return jnp.argmax(self.actor.apply(params, obs[None])[0])

    @partial(jax.jit, static_argnums=(0, 3, 5))
    def policy_eval(self, state, key, rep: int = 5, w=None, max_steps: int | None = None):
        act = lambda obs, w_, k: self.act_eval(state.actor_ts.params, obs)
        w = self.w if w is None else w
        return policy_evaluation(self.env, act, w, key, rep=rep, gamma=self.cfg.gamma, max_steps=max_steps)

    def make_buffer(self) -> ReplayBuffer:
        return ReplayBuffer.create(self.cfg.buffer_size, obs_dim=self.obs_dim, reward_dim=self.reward_dim)

    def train(self, total_timesteps: int, state=None, buffer=None):
        cfg = self.cfg
        state = state if state is not None else self.init_state()
        buffer = buffer if buffer is not None else self.make_buffer()
        iters = max(1, total_timesteps // cfg.num_envs)
        state, buffer = self.train_segment(state, buffer, iters)
        return state, buffer
