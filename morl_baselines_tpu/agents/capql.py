"""CAPQL — weight-Conditioned Approximately Pareto-optimal Q-Learning.

TPU-native re-design of reference multi_policy/capql/capql.py:32-485 (Lu et
al., 2023): continuous SAC conditioned on the weight vector.

- Behavior weights per episode from the normal-cone ``WeightSamplerAngle``
  around the 1-vector (reference :69-99); each transition stores its w
  (reference ReplayMemory :32-66).
- Critic: N q-nets Q(s, a, w) -> R^d; target is the *elementwise* min over
  nets minus alpha*logp, vector MSE (reference :321-338).
- Actor: scalarized min-Q minus alpha*logp (reference :340-350).

Device-resident: the w-augmented replay buffer is a pytree; N envs collect
with per-env conditioning weights resampled at episode end.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.weights import equally_spaced_weights
from ..envs.base import MOEnv
from ..envs.vector import EpisodeStats, VectorMOEnv
from ..evaluation.evaluation import evaluate_front, multi_policy_metrics
from ..models.continuous import ContinuousQNet, SquashedGaussianActor
from ..models.networks import TrainState, ensemble
from .base import MOAgentBase


def sample_angle_weights(key: jax.Array, n: int, dim: int, angle: float) -> jnp.ndarray:
    """Normal-cone weight sampling around the 1-vector (reference :69-99)."""
    k1, k2 = jax.random.split(key)
    w0 = jnp.ones((dim,)) / jnp.sqrt(float(dim))
    s = jax.random.normal(k1, (n, dim))
    s = s - (s @ w0)[:, None] * w0[None, :]
    s = s / jnp.maximum(jnp.linalg.norm(s, axis=1, keepdims=True), 1e-8)
    ang = jax.random.uniform(k2, (n, 1)) * angle
    w = jnp.tan(ang) * s + w0[None, :]
    return w / jnp.sum(jnp.abs(w), axis=1, keepdims=True)


class WTransition(NamedTuple):
    obs: jnp.ndarray
    action: jnp.ndarray
    w: jnp.ndarray
    reward: jnp.ndarray
    next_obs: jnp.ndarray
    terminated: jnp.ndarray


class WReplayBuffer(NamedTuple):
    """Ring buffer whose transitions carry the behavior weight (reference :32-66)."""

    data: WTransition
    ptr: jnp.ndarray
    size: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.data.obs.shape[0]

    @staticmethod
    def create(capacity: int, obs_dim: int, action_dim: int, reward_dim: int) -> "WReplayBuffer":
        data = WTransition(
            obs=jnp.zeros((capacity, obs_dim)),
            action=jnp.zeros((capacity, action_dim)),
            w=jnp.zeros((capacity, reward_dim)),
            reward=jnp.zeros((capacity, reward_dim)),
            next_obs=jnp.zeros((capacity, obs_dim)),
            terminated=jnp.zeros((capacity,)),
        )
        return WReplayBuffer(data=data, ptr=jnp.int32(0), size=jnp.int32(0))

    def add_batch(self, batch: WTransition) -> "WReplayBuffer":
        n = batch.obs.shape[0]
        idx = (self.ptr + jnp.arange(n)) % self.capacity
        data = jax.tree.map(lambda b, x: b.at[idx].set(x), self.data, batch)
        return WReplayBuffer(data, (self.ptr + n) % self.capacity, jnp.minimum(self.size + n, self.capacity))

    def sample(self, key: jax.Array, batch_size: int) -> WTransition:
        idx = jax.random.randint(key, (batch_size,), 0, jnp.maximum(self.size, 1))
        return jax.tree.map(lambda x: x[idx], self.data)


@dataclass(frozen=True)
class CAPQLConfig:
    learning_rate: float = 3e-4
    gamma: float = 0.99
    tau: float = 0.005
    alpha: float = 0.2
    batch_size: int = 256
    buffer_size: int = 100_000
    num_envs: int = 16
    learning_starts: int = 1000
    gradient_updates: int = 1
    num_q_nets: int = 2
    angle: float = 0.418  # ~24 deg, the reference example default
    hidden: tuple = (256, 256)
    seed: int = 0


class CAPQLState(NamedTuple):
    actor_ts: TrainState
    critic_ts: TrainState
    buffer: WReplayBuffer
    env_state: tuple
    obs: jnp.ndarray
    behavior_w: jnp.ndarray  # (N, d)
    stats: EpisodeStats
    key: jax.Array
    global_step: jnp.ndarray
    iter_count: jnp.ndarray


class CAPQL(MOAgentBase):
    def __init__(self, env: MOEnv, config: CAPQLConfig = CAPQLConfig(), log: bool = False):
        super().__init__(env, config, log=log)
        self.cfg = config
        self.venv = VectorMOEnv(env, config.num_envs)
        self.action_dim = env.action_dim
        self.actor = SquashedGaussianActor(action_dim=self.action_dim, hidden=config.hidden)
        self.critic = ensemble(ContinuousQNet, config.num_q_nets, reward_dim=env.reward_dim, hidden=config.hidden)

    def init_state(self, key: jax.Array | None = None) -> CAPQLState:
        cfg = self.cfg
        key = key if key is not None else jax.random.key(cfg.seed)
        ka, kc, ke, kw, key = jax.random.split(key, 5)
        dummy_obs = jnp.zeros((1, self.obs_dim))
        dummy_act = jnp.zeros((1, self.action_dim))
        dummy_w = jnp.zeros((1, self.reward_dim))
        actor_ts = TrainState.create(
            apply_fn=self.actor.apply,
            params=self.actor.init(ka, dummy_obs, dummy_w),
            tx=optax.adam(cfg.learning_rate),
        )
        cparams = self.critic.init(kc, dummy_obs, dummy_act, dummy_w)
        critic_ts = TrainState.create(
            apply_fn=self.critic.apply, params=cparams, target_params=cparams, tx=optax.adam(cfg.learning_rate)
        )
        env_state, obs = self.venv.reset(ke)
        return CAPQLState(
            actor_ts=actor_ts,
            critic_ts=critic_ts,
            buffer=WReplayBuffer.create(cfg.buffer_size, self.obs_dim, self.action_dim, self.reward_dim),
            env_state=env_state,
            obs=obs,
            behavior_w=sample_angle_weights(kw, cfg.num_envs, self.reward_dim, cfg.angle),
            stats=EpisodeStats.create(cfg.num_envs, self.reward_dim),
            key=key,
            global_step=jnp.int32(0),
            iter_count=jnp.int32(0),
        )

    # ---------------------------------------------------------------- update

    def _update(self, actor_ts, critic_ts, batch: WTransition, key):
        cfg = self.cfg
        k1, k2 = jax.random.split(key)
        mean, log_std = self.actor.apply(actor_ts.params, batch.next_obs, batch.w)
        next_a, next_logp = SquashedGaussianActor.sample(mean, log_std, k1)
        q_t = self.critic.apply(critic_ts.target_params, batch.next_obs, next_a, batch.w)  # (C, B, d)
        min_q_t = jnp.min(q_t, axis=0) - cfg.alpha * next_logp[:, None]
        target = batch.reward + (1.0 - batch.terminated[:, None]) * cfg.gamma * min_q_t

        def critic_loss_fn(params):
            q = self.critic.apply(params, batch.obs, batch.action, batch.w)
            return jnp.mean((q - target[None]) ** 2)

        closs, cgrads = jax.value_and_grad(critic_loss_fn)(critic_ts.params)
        critic_ts = critic_ts.apply_gradients(grads=cgrads)

        def actor_loss_fn(params):
            mean, log_std = self.actor.apply(params, batch.obs, batch.w)
            a, logp = SquashedGaussianActor.sample(mean, log_std, k2)
            q = self.critic.apply(critic_ts.params, batch.obs, a, batch.w)
            min_q = jnp.min(q, axis=0)
            min_q_scal = jnp.sum(min_q * batch.w, axis=-1)
            return jnp.mean(cfg.alpha * logp - min_q_scal)

        aloss, agrads = jax.value_and_grad(actor_loss_fn)(actor_ts.params)
        actor_ts = actor_ts.apply_gradients(grads=agrads)
        critic_ts = critic_ts.replace(
            target_params=optax.incremental_update(critic_ts.params, critic_ts.target_params, cfg.tau)
        )
        return actor_ts, critic_ts

    # ---------------------------------------------------------- train segment

    @partial(jax.jit, static_argnums=(0, 2))
    def train_segment(self, state: CAPQLState, num_iters: int):
        cfg = self.cfg

        def body(s: CAPQLState, _):
            key, k_act, k_step, k_w, k_upd, k_rand = jax.random.split(s.key, 6)
            mean, log_std = self.actor.apply(s.actor_ts.params, s.obs, s.behavior_w)
            a_pol, _ = SquashedGaussianActor.sample(mean, log_std, k_act)
            a_rand = jax.random.uniform(k_rand, a_pol.shape, minval=-1.0, maxval=1.0)
            actions = jnp.where(s.global_step < cfg.learning_starts, a_rand, a_pol)

            out = self.venv.step(s.env_state, actions, k_step)
            done = out.terminated | out.truncated
            stats, _ = s.stats.update(out.reward, done, cfg.gamma)
            buffer = s.buffer.add_batch(
                WTransition(
                    obs=s.obs,
                    action=actions,
                    w=s.behavior_w,
                    reward=out.reward,
                    next_obs=out.final_obs,
                    terminated=out.terminated.astype(jnp.float32),
                )
            )
            new_w = sample_angle_weights(k_w, cfg.num_envs, self.reward_dim, cfg.angle)
            behavior_w = jnp.where(done[:, None], new_w, s.behavior_w)

            def do_update(args):
                actor_ts, critic_ts = args

                def one(carry, k):
                    a_ts, c_ts = carry
                    batch = buffer.sample(k, cfg.batch_size)
                    a_ts, c_ts = self._update(a_ts, c_ts, batch, k)
                    return (a_ts, c_ts), None

                (actor_ts, critic_ts), _ = jax.lax.scan(
                    one, (actor_ts, critic_ts), jax.random.split(k_upd, cfg.gradient_updates)
                )
                return actor_ts, critic_ts

            actor_ts, critic_ts = jax.lax.cond(
                s.global_step >= cfg.learning_starts, do_update, lambda a: a, (s.actor_ts, s.critic_ts)
            )
            return (
                s._replace(
                    actor_ts=actor_ts,
                    critic_ts=critic_ts,
                    buffer=buffer,
                    env_state=out.state,
                    obs=out.obs,
                    behavior_w=behavior_w,
                    stats=stats,
                    key=key,
                    global_step=s.global_step + cfg.num_envs,
                    iter_count=s.iter_count + 1,
                ),
                None,
            )

        state, _ = jax.lax.scan(body, state, None, length=num_iters)
        return state

    # ------------------------------------------------------------------ eval

    def act_eval(self, params, obs, w, key=None):
        mean, _ = self.actor.apply(params, obs[None], w[None])
        return jnp.tanh(mean[0])

    @partial(jax.jit, static_argnums=(0, 3, 4))
    def _eval_front(self, state: CAPQLState, weights, rep: int, max_steps: int):
        act = lambda obs, w, k: self.act_eval(state.actor_ts.params, obs, w)
        return evaluate_front(
            self.env, act, weights, jax.random.key(0), rep=rep, gamma=self.cfg.gamma, max_steps=max_steps
        )

    def train(
        self,
        total_timesteps: int,
        ref_point: np.ndarray | None = None,
        known_pareto_front: np.ndarray | None = None,
        eval_freq: int = 10_000,
        num_eval_weights_for_front: int = 32,
        eval_max_steps: int | None = None,
        state: CAPQLState | None = None,
    ) -> CAPQLState:
        cfg = self.cfg
        state = state if state is not None else self.init_state()
        eval_weights = jnp.asarray(
            equally_spaced_weights(self.reward_dim, num_eval_weights_for_front), dtype=jnp.float32
        )
        iters_total = max(1, total_timesteps // cfg.num_envs)
        seg = max(1, min(eval_freq // cfg.num_envs, iters_total))
        done_iters = 0
        while done_iters < iters_total:
            n = min(seg, iters_total - done_iters)
            state = self.train_segment(state, n)
            done_iters += n
            if ref_point is not None:
                front = np.asarray(
                    self._eval_front(state, eval_weights, 1, eval_max_steps or self.env.max_episode_steps or 500)
                )
                metrics = multi_policy_metrics(front, np.asarray(ref_point), np.asarray(eval_weights), known_pareto_front)
                self.logger.log(metrics, int(state.global_step))
                self._last_front, self._last_metrics = front, metrics
        return state
