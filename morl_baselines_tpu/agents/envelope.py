"""Envelope Q-Learning — fully device-resident actor-learner.

TPU-native re-design of the reference Envelope implementation
(reference multi_policy/envelope/envelope.py:33-573; Yang et al., 2019):

- Q(s, w) in R^{A x d} conditioned on the weight vector (reference :33-77).
- Envelope TD target: online-net argmax over (sampled weights w', actions)
  of w·Q(s', a, w'), evaluated on the target net (reference :404-440).
- Homotopy loss (1-λ)·MSE(Q, y) + λ·MSE(w·Q, w·y), λ linearly scheduled
  (reference :309-313, 348-355).
- Per-episode Gaussian weight resampling (reference :526-569); optional PER
  with priorities |w·td|^alpha (reference :329-334, 507-525).

Architectural inversion vs the reference (SURVEY §7): the reference steps ONE
host env per python iteration and pays a host<->device copy per update; here
``num_envs`` envs live on device, and a whole segment of
(act -> step -> store -> learn) iterations runs as one ``lax.scan`` under
jit — the host only orchestrates segments, evaluation, and logging.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.weights import equally_spaced_weights, random_weights
from ..envs.base import MOEnv
from ..envs.vector import EpisodeStats, VectorMOEnv
from ..evaluation.evaluation import evaluate_front, multi_policy_metrics
from ..models.networks import EnvelopeQNet, TrainState
from ..replay.buffer import ReplayBuffer, Transition
from ..replay.prioritized import PrioritizedReplayBuffer
from ..utils.schedules import linearly_decaying_value
from .base import MOAgentBase


@dataclass(frozen=True)
class EnvelopeConfig:
    learning_rate: float = 3e-4
    gamma: float = 0.98
    batch_size: int = 128
    buffer_size: int = 100_000
    num_envs: int = 32
    learning_starts: int = 200
    train_freq: int = 1  # env-iterations between updates (each steps num_envs envs)
    gradient_updates: int = 1
    target_net_update_freq: int = 200  # in env-iterations
    tau: float = 1.0
    num_sample_w: int = 4
    initial_epsilon: float = 1.0
    final_epsilon: float = 0.05
    epsilon_decay_steps: int = 50_000
    initial_homotopy_lambda: float = 0.0
    final_homotopy_lambda: float = 1.0
    homotopy_decay_steps: int = 100_000
    max_grad_norm: float = 1.0
    per: bool = False
    per_alpha: float = 0.6
    min_priority: float = 0.01
    hidden: tuple = (256, 256, 256, 256)
    bf16: bool = False  # bfloat16 compute in the Q-net GEMMs (params stay f32)
    image_shape: tuple | None = None  # (k, H, W): NatureCNN trunk on flat image obs
    seed: int = 0


class EnvelopeState(NamedTuple):
    ts: TrainState
    buffer: ReplayBuffer | PrioritizedReplayBuffer
    env_state: tuple
    obs: jnp.ndarray  # (N, obs_dim)
    weights: jnp.ndarray  # (N, d) current per-env episode weight
    stats: EpisodeStats
    key: jax.Array
    global_step: jnp.ndarray  # int32 env steps (counts individual env transitions)
    iter_count: jnp.ndarray  # int32 scan iterations


class Envelope(MOAgentBase):
    def __init__(self, env: MOEnv, config: EnvelopeConfig = EnvelopeConfig(), log: bool = False):
        super().__init__(env, config, log=log)
        self.cfg = config
        self.venv = VectorMOEnv(env, config.num_envs)
        self.q_net = EnvelopeQNet(
            num_actions=env.num_actions,
            reward_dim=env.reward_dim,
            hidden=config.hidden,
            dtype=jnp.bfloat16 if config.bf16 else None,
            image_shape=config.image_shape,
        )

    # ------------------------------------------------------------------ init

    def init_state(self, key: jax.Array | None = None) -> EnvelopeState:
        cfg = self.cfg
        key = key if key is not None else jax.random.key(cfg.seed)
        k_params, k_env, k_w, key = jax.random.split(key, 4)
        dummy_obs = jnp.zeros((1, self.obs_dim))
        dummy_w = jnp.zeros((1, self.reward_dim))
        params = self.q_net.init(k_params, dummy_obs, dummy_w)
        tx = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.adam(cfg.learning_rate),
        )
        ts = TrainState.create(
            apply_fn=self.q_net.apply, params=params, target_params=params, tx=tx
        )
        buf_cls = PrioritizedReplayBuffer if cfg.per else ReplayBuffer
        buffer = buf_cls.create(
            cfg.buffer_size, obs_dim=self.obs_dim, reward_dim=self.reward_dim
        )
        env_state, obs = self.venv.reset(k_env)
        weights = random_weights(k_w, self.reward_dim, n=cfg.num_envs, dist="gaussian")
        return EnvelopeState(
            ts=ts,
            buffer=buffer,
            env_state=env_state,
            obs=obs,
            weights=weights,
            stats=EpisodeStats.create(cfg.num_envs, self.reward_dim),
            key=key,
            global_step=jnp.int32(0),
            iter_count=jnp.int32(0),
        )

    # ------------------------------------------------------------ update math

    def _envelope_target(self, ts: TrainState, next_obs, w, sampled_w):
        """max over (sampled w', a) of w·Q_online(s',a,w'), read off Q_target.

        Reference envelope.py:404-440.  Shapes: next_obs (B, O), w (B, d),
        sampled_w (W, d).  One batched forward over B*W rows -> MXU.
        """
        B = next_obs.shape[0]
        W = sampled_w.shape[0]
        no = jnp.repeat(next_obs, W, axis=0)  # (B*W, O)
        ws = jnp.tile(sampled_w, (B, 1))  # (B*W, d)
        q_online = ts.apply_fn(ts.params, no, ws).reshape(B, W, -1, self.reward_dim)
        scal = jnp.einsum("bd,bwad->bwa", w, q_online)
        best_a = jnp.argmax(scal, axis=2)  # (B, W)
        best_w = jnp.argmax(jnp.max(scal, axis=2), axis=1)  # (B,)
        q_target = ts.apply_fn(ts.target_params, no, ws).reshape(B, W, -1, self.reward_dim)
        q_at_a = jnp.take_along_axis(q_target, best_a[:, :, None, None], axis=2).squeeze(2)  # (B, W, d)
        return jnp.take_along_axis(q_at_a, best_w[:, None, None], axis=1).squeeze(1)  # (B, d)

    def _update(self, ts: TrainState, batch: Transition, key: jax.Array, homotopy_lambda):
        """One gradient step on the envelope loss; returns (ts, td_scal_first_B)."""
        cfg = self.cfg
        B = batch.obs.shape[0]
        k_w, _ = jax.random.split(key)
        sampled_w = random_weights(k_w, self.reward_dim, n=cfg.num_sample_w, dist="gaussian")
        # tile batch across sampled weights (reference :279-291)
        w = jnp.repeat(sampled_w, B, axis=0)  # (W*B, d)
        obs = jnp.tile(batch.obs, (cfg.num_sample_w, 1))
        actions = jnp.tile(batch.action, (cfg.num_sample_w,))
        rewards = jnp.tile(batch.reward, (cfg.num_sample_w, 1))
        next_obs = jnp.tile(batch.next_obs, (cfg.num_sample_w, 1))
        dones = jnp.tile(batch.terminated, (cfg.num_sample_w,))

        target_next = self._envelope_target(ts, next_obs, w, sampled_w)
        y = rewards + (1.0 - dones[:, None]) * cfg.gamma * target_next

        def loss_fn(params):
            q = ts.apply_fn(params, obs, w)  # (W*B, A, d)
            q_sa = jnp.take_along_axis(q, actions[:, None, None].astype(jnp.int32), axis=1).squeeze(1)
            l_mo = jnp.mean((q_sa - y) ** 2)
            wq = jnp.sum(q_sa * w, axis=-1)
            wy = jnp.sum(y * w, axis=-1)
            l_scal = jnp.mean((wq - wy) ** 2)
            loss = (1.0 - homotopy_lambda) * l_mo + homotopy_lambda * l_scal
            td_scal = wq - wy
            return loss, (td_scal, l_mo)

        (loss, (td_scal, l_mo)), grads = jax.value_and_grad(loss_fn, has_aux=True)(ts.params)
        ts = ts.apply_gradients(grads=grads)
        return ts, loss, td_scal[:B]

    # ---------------------------------------------------------- train segment

    def _epsilon(self, global_step):
        # schedules run on the PER-ENV step clock so reference configs (1 env,
        # reference envelope.py:50k decay) keep their meaning at any num_envs:
        # with N parallel envs a global-step clock would collapse epsilon to
        # its final value after ~1 episode per env and exploration never
        # completes long-horizon tasks (observed on minecart)
        cfg = self.cfg
        if cfg.epsilon_decay_steps is None:
            return cfg.initial_epsilon
        return linearly_decaying_value(
            cfg.initial_epsilon,
            cfg.epsilon_decay_steps,
            global_step // cfg.num_envs,
            cfg.learning_starts // cfg.num_envs,
            cfg.final_epsilon,
        )

    def _homotopy_lambda(self, global_step):
        cfg = self.cfg
        if cfg.homotopy_decay_steps is None:
            return cfg.initial_homotopy_lambda
        return linearly_decaying_value(
            cfg.initial_homotopy_lambda,
            cfg.homotopy_decay_steps,
            global_step // cfg.num_envs,
            cfg.learning_starts // cfg.num_envs,
            cfg.final_homotopy_lambda,
        )

    def _greedy_actions(self, params, obs, weights):
        q = self.q_net.apply(params, obs, weights)  # (N, A, d)
        scal = jnp.einsum("nd,nad->na", weights, q)
        return jnp.argmax(scal, axis=-1)

    @partial(jax.jit, static_argnums=(0, 2))
    def train_segment(self, state: EnvelopeState, num_iters: int):
        """Run ``num_iters`` actor-learner iterations as one scanned program."""
        cfg = self.cfg

        def body(s: EnvelopeState, _):
            key, k_eps, k_act, k_step, k_w, k_samp, k_upd = jax.random.split(s.key, 7)
            eps = self._epsilon(s.global_step)
            # epsilon-greedy batched act
            greedy = self._greedy_actions(s.ts.params, s.obs, s.weights)
            rand_a = jax.random.randint(k_act, (cfg.num_envs,), 0, self.env.num_actions)
            explore = jax.random.uniform(k_eps, (cfg.num_envs,)) < eps
            actions = jnp.where(explore, rand_a, greedy)

            out = self.venv.step(s.env_state, actions, k_step)
            done = out.terminated | out.truncated
            stats, _fin = s.stats.update(out.reward, done, cfg.gamma)

            # store transitions: next_obs must be the pre-reset final obs
            tr = Transition(
                obs=s.obs,
                action=actions,
                reward=out.reward,
                next_obs=out.final_obs,
                terminated=out.terminated.astype(jnp.float32),
            )
            buffer = s.buffer.add_batch(tr)

            # per-episode weight resampling (reference :526-569)
            new_w = random_weights(k_w, self.reward_dim, n=cfg.num_envs, dist="gaussian")
            weights = jnp.where(done[:, None], new_w, s.weights)

            global_step = s.global_step + cfg.num_envs
            iter_count = s.iter_count + 1

            # learn
            def do_update(args):
                ts, buffer = args
                lam = self._homotopy_lambda(global_step)

                def one(carry, k):
                    ts, buffer = carry
                    if cfg.per:
                        batch, idx, _probs = buffer.sample(k, cfg.batch_size)
                        ts, loss, td = self._update(ts, batch, k, lam)
                        prio = (jnp.abs(td) + cfg.min_priority) ** cfg.per_alpha
                        buffer = buffer.update_priorities(idx, prio)
                    else:
                        batch = buffer.sample(k, cfg.batch_size)
                        ts, loss, td = self._update(ts, batch, k, lam)
                    return (ts, buffer), loss

                keys = jax.random.split(k_upd, cfg.gradient_updates)
                if cfg.gradient_updates == 1:
                    # avoid a nested scan inside lax.cond (pathological on some
                    # backends); single update inlined
                    (ts, buffer), _ = one((ts, buffer), keys[0])
                else:
                    (ts, buffer), losses = jax.lax.scan(one, (ts, buffer), keys)
                return ts, buffer

            can_learn = (global_step >= cfg.learning_starts) & (iter_count % cfg.train_freq == 0)
            ts, buffer = jax.lax.cond(can_learn, do_update, lambda a: a, (s.ts, buffer))

            # target net update (hard every freq iters, or polyak if tau<1)
            if cfg.tau < 1.0:
                tgt = optax.incremental_update(ts.params, ts.target_params, cfg.tau)
                ts = ts.replace(target_params=tgt)
            else:
                ts = jax.lax.cond(
                    iter_count % cfg.target_net_update_freq == 0,
                    lambda t: t.replace(target_params=t.params),
                    lambda t: t,
                    ts,
                )

            return (
                EnvelopeState(ts, buffer, out.state, out.obs, weights, stats, key, global_step, iter_count),
                None,
            )

        state, _ = jax.lax.scan(body, state, None, length=num_iters)
        return state

    # ------------------------------------------------------------------ eval

    def act_eval(self, params, obs, w, key=None):
        """Greedy scalarized action (reference eval/max_action :374-405)."""
        q = self.q_net.apply(params, obs[None], w[None])[0]
        return jnp.argmax(q @ w)

    @partial(jax.jit, static_argnums=(0, 3, 4))
    def _eval_front(self, params, weights, rep: int, max_steps: int, key=None):
        act = lambda obs, w, k: self.act_eval(params, obs, w)
        key = key if key is not None else jax.random.key(0)
        return evaluate_front(self.env, act, weights, key, rep=rep, gamma=self.cfg.gamma, max_steps=max_steps)

    # ----------------------------------------------------------------- train

    def train(
        self,
        total_timesteps: int,
        eval_env: MOEnv | None = None,
        ref_point: np.ndarray | None = None,
        known_pareto_front: np.ndarray | None = None,
        eval_freq: int = 10_000,
        num_eval_weights_for_front: int = 32,
        num_eval_episodes_for_front: int = 1,
        eval_max_steps: int | None = None,
        state: EnvelopeState | None = None,
    ) -> EnvelopeState:
        """Host loop: segments of jitted iterations + periodic front evaluation."""
        cfg = self.cfg
        state = state if state is not None else self.init_state()
        eval_weights = jnp.asarray(
            equally_spaced_weights(self.reward_dim, num_eval_weights_for_front), dtype=jnp.float32
        )
        iters_total = max(1, total_timesteps // cfg.num_envs)
        seg = max(1, min(eval_freq // cfg.num_envs, iters_total))
        t0 = time.time()
        done_iters = 0
        while done_iters < iters_total:
            n = min(seg, iters_total - done_iters)
            state = self.train_segment(state, n)
            done_iters += n
            gstep = int(state.global_step)
            if ref_point is not None:
                front = np.asarray(
                    self._eval_front(
                        state.ts.params,
                        eval_weights,
                        num_eval_episodes_for_front,
                        eval_max_steps or self.env.max_episode_steps or 500,
                    )
                )
                metrics = multi_policy_metrics(
                    front, np.asarray(ref_point), np.asarray(eval_weights), known_pareto_front
                )
                metrics["charts/SPS"] = gstep / (time.time() - t0)
                self.logger.log(metrics, gstep)
                self._last_front = front
                self._last_metrics = metrics
        return state
