"""GPI-LS continuous-action — weight-conditioned TD3 with GPI eval policy.

TPU-native re-design of reference
multi_policy/gpi_pd/gpi_pd_continuous_action.py:34-713 and its JAX twin
gpi_ls_continuous_action_jax.py:36-1046:

- Deterministic weight-conditioned actor mu(s, w) and N critics Q(s, a, w)
  -> R^d (reference :34-73).
- Target: min over (2 sampled) critics of the scalarized Q at the smoothed
  target action (policy smoothing noise, reference :395-403); delayed actor
  updates (reference :422-432).
- Batch weights: half current task w, half sampled from the support M; GPI
  used for *evaluation* action selection — argmax over support policies'
  actions (reference :454-485).
- LinearSupport outer loop identical to the discrete GPILS.
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

from ..core.weights import equally_spaced_weights
from ..envs.base import Box, MOEnv
from ..envs.vector import EpisodeStats, VectorMOEnv
from ..evaluation.evaluation import multi_policy_metrics, policy_evaluation
from ..models.continuous import ContinuousQNet, DeterministicActor, StabilizedActor, StabilizedQNet
from ..models.networks import TrainState, ensemble
from ..outer.linear_support import LinearSupport
from ..replay.buffer import ReplayBuffer, Transition
from ..utils.schedules import unique_tol
from .base import MOAgentBase


@dataclass(frozen=True)
class GPILSContinuousConfig:
    learning_rate: float = 3e-4
    gamma: float = 0.99
    tau: float = 0.005
    batch_size: int = 128
    buffer_size: int = 400_000
    num_envs: int = 16
    learning_starts: int = 1000
    gradient_updates: int = 1
    policy_freq: int = 2
    n_critics: int = 2
    policy_noise: float = 0.2
    noise_clip: float = 0.5
    exploration_noise: float = 0.1
    hidden: tuple = (256, 256)
    max_support: int = 32
    use_gpi: bool = True
    # stability recipe of the reference's JAX continuous critics
    # (gpi_ls_continuous_action_jax.py:63-107): BatchRenorm + WeightNorm +
    # leaky-relu + dropout.  Disable for the plain relu/no-norm nets.
    use_batch_renorm: bool = True
    dropout_rate: float = 0.01
    batch_norm_momentum: float = 0.99
    seed: int = 0


class GPILSContState(NamedTuple):
    actor_ts: TrainState
    critic_ts: TrainState
    buffer: ReplayBuffer
    env_state: tuple
    obs: jnp.ndarray
    task_w: jnp.ndarray
    support: jnp.ndarray
    support_size: jnp.ndarray
    stats: EpisodeStats
    key: jax.Array
    global_step: jnp.ndarray
    iter_count: jnp.ndarray


class GPILSContinuous(MOAgentBase):
    def __init__(self, env: MOEnv, config: GPILSContinuousConfig = GPILSContinuousConfig(), log: bool = False):
        super().__init__(env, config, log=log)
        assert isinstance(env.action_space, Box)
        self.cfg = config
        self.venv = VectorMOEnv(env, config.num_envs)
        self.action_dim = env.action_dim
        if config.use_batch_renorm:
            self.actor = StabilizedActor(
                action_dim=self.action_dim, hidden=config.hidden, momentum=config.batch_norm_momentum
            )
            self.critic = ensemble(
                StabilizedQNet,
                config.n_critics,
                reward_dim=env.reward_dim,
                hidden=config.hidden,
                dropout_rate=config.dropout_rate,
                momentum=config.batch_norm_momentum,
            )
        else:
            self.actor = DeterministicActor(action_dim=self.action_dim, hidden=config.hidden)
            self.critic = ensemble(
                ContinuousQNet, config.n_critics, reward_dim=env.reward_dim, hidden=config.hidden
            )

    @staticmethod
    def _polyak_stats(new, old, tau: float):
        """Polyak-track batch statistics; integer leaves (step counters) copy hard."""
        return jax.tree.map(
            lambda a, b: a if jnp.issubdtype(a.dtype, jnp.integer) else tau * a + (1.0 - tau) * b,
            new,
            old,
        )

    # ---- forward helpers: one code path for plain and BatchRenorm modules --

    def _actor_fwd(self, ts: TrainState, obs, w, target: bool = False):
        """Eval-mode actor forward (running batch statistics)."""
        params = ts.target_params if target else ts.params
        if not self.cfg.use_batch_renorm:
            return self.actor.apply({"params": params}, obs, w)
        bs = ts.target_batch_stats if target else ts.batch_stats
        return self.actor.apply({"params": params, "batch_stats": bs}, obs, w, False)

    def _critic_fwd(self, ts: TrainState, obs, action, w, target: bool = False):
        """Eval-mode critic forward -> (C, B, d)."""
        params = ts.target_params if target else ts.params
        if not self.cfg.use_batch_renorm:
            return self.critic.apply({"params": params}, obs, action, w)
        bs = ts.target_batch_stats if target else ts.batch_stats
        return self.critic.apply({"params": params, "batch_stats": bs}, obs, action, w, False, True)

    def init_state(self, key: jax.Array | None = None) -> GPILSContState:
        cfg = self.cfg
        key = key if key is not None else jax.random.key(cfg.seed)
        ka, kc, ke, key = jax.random.split(key, 4)
        d_obs = jnp.zeros((1, self.obs_dim))
        d_act = jnp.zeros((1, self.action_dim))
        d_w = jnp.zeros((1, self.reward_dim))
        avars = self.actor.init(ka, d_obs, d_w)
        cvars = self.critic.init(kc, d_obs, d_act, d_w)
        abstats = avars.get("batch_stats")
        cbstats = cvars.get("batch_stats")
        actor_ts = TrainState.create(
            apply_fn=self.actor.apply,
            params=avars["params"],
            target_params=avars["params"],
            batch_stats=abstats,
            target_batch_stats=abstats,
            tx=optax.adam(cfg.learning_rate),
        )
        critic_ts = TrainState.create(
            apply_fn=self.critic.apply,
            params=cvars["params"],
            target_params=cvars["params"],
            batch_stats=cbstats,
            target_batch_stats=cbstats,
            tx=optax.adam(cfg.learning_rate),
        )
        env_state, obs = self.venv.reset(ke)
        d = self.reward_dim
        support = jnp.zeros((cfg.max_support, d)).at[0].set(jnp.ones((d,)) / d)
        return GPILSContState(
            actor_ts=actor_ts,
            critic_ts=critic_ts,
            buffer=ReplayBuffer.create(
                cfg.buffer_size, obs_dim=self.obs_dim, action_shape=(self.action_dim,),
                reward_dim=d, action_dtype=jnp.float32,
            ),
            env_state=env_state,
            obs=obs,
            task_w=jnp.tile(support[0][None], (cfg.num_envs, 1)),
            support=support,
            support_size=jnp.int32(1),
            stats=EpisodeStats.create(cfg.num_envs, d),
            key=key,
            global_step=jnp.int32(0),
            iter_count=jnp.int32(0),
        )

    def set_weight_support(self, state: GPILSContState, weights: list[np.ndarray]) -> GPILSContState:
        ws = unique_tol([np.asarray(w) for w in weights])[: self.cfg.max_support]
        support = np.zeros((self.cfg.max_support, self.reward_dim), dtype=np.float32)
        for i, w in enumerate(ws):
            support[i] = w
        return state._replace(support=jnp.asarray(support), support_size=jnp.int32(max(len(ws), 1)))

    # ---------------------------------------------------------------- update

    def _update(self, s: GPILSContState, batch: Transition, w: jnp.ndarray, key: jax.Array):
        cfg = self.cfg
        k_noise, k_drop, k_act = jax.random.split(key, 3)
        noise = jnp.clip(
            jax.random.normal(k_noise, (batch.obs.shape[0], self.action_dim)) * cfg.policy_noise,
            -cfg.noise_clip,
            cfg.noise_clip,
        )
        next_a = jnp.clip(self._actor_fwd(s.actor_ts, batch.next_obs, w, target=True) + noise, -1.0, 1.0)
        q_next = self._critic_fwd(s.critic_ts, batch.next_obs, next_a, w, target=True)  # (C, B, d)
        scal = jnp.einsum("cbd,bd->cb", q_next, w)
        min_ind = jnp.argmin(scal, axis=0)
        min_q = jnp.take_along_axis(q_next, min_ind[None, :, None], axis=0).squeeze(0)  # (B, d)
        target = batch.reward + (1.0 - batch.terminated[:, None]) * cfg.gamma * min_q

        if cfg.use_batch_renorm:
            # train-mode apply mutates the BatchRenorm running statistics
            def critic_loss_fn(params):
                q, mut = self.critic.apply(
                    {"params": params, "batch_stats": s.critic_ts.batch_stats},
                    batch.obs, batch.action, w, True, False,
                    rngs={"dropout": k_drop},
                    mutable=["batch_stats"],
                )
                return jnp.mean((q - target[None]) ** 2), mut["batch_stats"]

            (closs, new_cbs), cgrads = jax.value_and_grad(critic_loss_fn, has_aux=True)(s.critic_ts.params)
            critic_ts = s.critic_ts.apply_gradients(grads=cgrads).replace(batch_stats=new_cbs)
        else:
            def critic_loss_fn(params):
                q = self.critic.apply({"params": params}, batch.obs, batch.action, w)
                return jnp.mean((q - target[None]) ** 2)

            closs, cgrads = jax.value_and_grad(critic_loss_fn)(s.critic_ts.params)
            critic_ts = s.critic_ts.apply_gradients(grads=cgrads)

        def actor_update(args):
            actor_ts, critic_ts = args

            if cfg.use_batch_renorm:
                def actor_loss_fn(params):
                    a, mut = self.actor.apply(
                        {"params": params, "batch_stats": actor_ts.batch_stats},
                        batch.obs, w, True,
                        mutable=["batch_stats"],
                    )
                    # critic in eval mode: running stats, no stat pollution
                    q = self._critic_fwd(critic_ts, batch.obs, a, w)
                    return -jnp.mean(jnp.einsum("bd,bd->b", q.mean(axis=0), w)), mut["batch_stats"]

                (aloss, new_abs), agrads = jax.value_and_grad(actor_loss_fn, has_aux=True)(actor_ts.params)
                actor_ts = actor_ts.apply_gradients(grads=agrads).replace(batch_stats=new_abs)
            else:
                def actor_loss_fn(params):
                    a = self.actor.apply({"params": params}, batch.obs, w)
                    q = self.critic.apply({"params": critic_ts.params}, batch.obs, a, w)
                    return -jnp.mean(jnp.einsum("bd,bd->b", q.mean(axis=0), w))

                aloss, agrads = jax.value_and_grad(actor_loss_fn)(actor_ts.params)
                actor_ts = actor_ts.apply_gradients(grads=agrads)
            actor_ts = actor_ts.replace(
                target_params=optax.incremental_update(actor_ts.params, actor_ts.target_params, cfg.tau),
                target_batch_stats=self._polyak_stats(
                    actor_ts.batch_stats, actor_ts.target_batch_stats, cfg.tau
                )
                if cfg.use_batch_renorm
                else actor_ts.target_batch_stats,
            )
            return actor_ts, critic_ts

        actor_ts, critic_ts = jax.lax.cond(
            s.iter_count % cfg.policy_freq == 0, actor_update, lambda a: a, (s.actor_ts, critic_ts)
        )
        critic_ts = critic_ts.replace(
            target_params=optax.incremental_update(critic_ts.params, critic_ts.target_params, cfg.tau),
            target_batch_stats=self._polyak_stats(
                critic_ts.batch_stats, critic_ts.target_batch_stats, cfg.tau
            )
            if cfg.use_batch_renorm
            else critic_ts.target_batch_stats,
        )
        # PER priority matches the reference exactly: first critic's per-dim
        # |q - target| scaled by 0.05, then w-scalarized (reference
        # gpi_pd_continuous_action.py:412-416 — NOT |w·td| over all critics;
        # the 0.05 factor means most rows clip to the min_priority floor,
        # giving the near-uniform PER distribution the parity curves assume).
        q_pred = self._critic_fwd(s.critic_ts, batch.obs, batch.action, w)  # (C, B, d)
        td_w = jnp.einsum("bd,bd->b", jnp.abs(q_pred[0] - target) * 0.05, w)
        return s._replace(actor_ts=actor_ts, critic_ts=critic_ts), td_w

    # ---------------------------------------------------------- train segment

    @partial(jax.jit, static_argnums=(0, 2, 3))
    def train_segment(self, state: GPILSContState, num_iters: int, change_w_every_episode: bool = True):
        cfg = self.cfg

        def body(s: GPILSContState, _):
            key, k_act, k_step, k_w, k_upd, k_rand = jax.random.split(s.key, 6)
            a_pol = self._actor_fwd(s.actor_ts, s.obs, s.task_w)
            a_pol = jnp.clip(
                a_pol + jax.random.normal(k_act, a_pol.shape) * cfg.exploration_noise, -1.0, 1.0
            )
            a_rand = jax.random.uniform(k_rand, a_pol.shape, minval=-1.0, maxval=1.0)
            actions = jnp.where(s.global_step < cfg.learning_starts, a_rand, a_pol)

            out = self.venv.step(s.env_state, actions, k_step)
            done = out.terminated | out.truncated
            stats, _ = s.stats.update(out.reward, done, cfg.gamma)
            buffer = s.buffer.add_batch(
                Transition(
                    obs=s.obs, action=actions, reward=out.reward,
                    next_obs=out.final_obs, terminated=out.terminated.astype(jnp.float32),
                )
            )
            if change_w_every_episode:
                idx = jax.random.randint(k_w, (cfg.num_envs,), 0, s.support_size)
                task_w = jnp.where(done[:, None], s.support[idx], s.task_w)
            else:
                task_w = s.task_w
            s = s._replace(
                buffer=buffer, env_state=out.state, obs=out.obs, task_w=task_w, stats=stats,
                key=key, global_step=s.global_step + cfg.num_envs, iter_count=s.iter_count + 1,
            )

            def do_update(s2):
                def one(s3, k):
                    kb, kw1, kw2, ku = jax.random.split(k, 4)
                    batch = s3.buffer.sample(kb, cfg.batch_size)
                    half = cfg.batch_size // 2
                    # per-row current task weights across envs (see gpils.py)
                    w1 = s3.task_w[jax.random.randint(kw1, (half,), 0, cfg.num_envs)]
                    sidx = jax.random.randint(kw2, (cfg.batch_size - half,), 0, s3.support_size)
                    w = jnp.concatenate([w1, s3.support[sidx]], axis=0)
                    s3, _td = self._update(s3, batch, w, ku)
                    return s3, None

                s2, _ = jax.lax.scan(one, s2, jax.random.split(k_upd, cfg.gradient_updates))
                return s2

            s = jax.lax.cond(s.global_step >= cfg.learning_starts, do_update, lambda x: x, s)
            return s, None

        state, _ = jax.lax.scan(body, state, None, length=num_iters)
        return state

    # ------------------------------------------------------------------ eval

    def act_eval(self, state: GPILSContState, obs, w, key=None):
        """GPI action: evaluate each support policy's action under w, pick best.

        Reference gpi_pd_continuous_action.py:454-485.
        """
        if not self.cfg.use_gpi:
            return self._actor_fwd(state.actor_ts, obs[None], w[None])[0]
        M = state.support  # (Ms, d)
        obs_m = jnp.tile(obs[None], (M.shape[0], 1))
        acts = self._actor_fwd(state.actor_ts, obs_m, M)  # (Ms, A)
        q = self._critic_fwd(state.critic_ts, obs_m, acts, M)  # (C, Ms, d)
        scal = jnp.einsum("cmd,d->cm", q, w).mean(axis=0)
        scal = jnp.where(jnp.arange(M.shape[0]) < state.support_size, scal, -jnp.inf)
        return acts[jnp.argmax(scal)]

    @partial(jax.jit, static_argnums=(0, 3, 4))
    def eval_weights_values(self, state: GPILSContState, weights: jnp.ndarray, rep: int, max_steps: int):
        act = lambda obs, w, k: self.act_eval(state, obs, w)
        keys = jax.random.split(jax.random.key(0), weights.shape[0])
        _, discs = jax.vmap(
            lambda w, k: policy_evaluation(self.env, act, w, k, rep, self.cfg.gamma, max_steps)
        )(weights, keys)
        return discs

    def eval_weights_values_padded(
        self, state, weights: np.ndarray, rep: int, max_steps: int
    ) -> np.ndarray:
        """Pad weight batches to power-of-two buckets: one compile per bucket
        instead of one per corner-weight count (see gpils.py)."""
        ws = np.asarray(weights, dtype=np.float32)
        n = ws.shape[0]
        m = 1 << max(0, (n - 1)).bit_length()
        if m > n:
            ws = np.concatenate([ws, np.tile(ws[-1:], (m - n, 1))], axis=0)
        vals = self.eval_weights_values(state, jnp.asarray(ws), rep, max_steps)
        return np.asarray(vals)[:n]

    # ----------------------------------------------------------------- train

    def train(
        self,
        total_timesteps: int,
        ref_point: np.ndarray | None = None,
        known_pareto_front: np.ndarray | None = None,
        num_eval_weights_for_front: int = 32,
        num_eval_episodes_for_front: int = 1,
        timesteps_per_iter: int = 10_000,
        weight_selection_algo: str = "gpi-ls",
        eval_max_steps: int | None = None,
        state: GPILSContState | None = None,
    ) -> GPILSContState:
        cfg = self.cfg
        state = state if state is not None else self.init_state()
        max_steps = eval_max_steps or self.env.max_episode_steps or 500
        linear_support = LinearSupport(
            num_objectives=self.reward_dim, epsilon=0.0 if weight_selection_algo == "ols" else None
        )
        eval_weights = jnp.asarray(
            equally_spaced_weights(self.reward_dim, num_eval_weights_for_front), dtype=jnp.float32
        )
        max_iter = max(1, total_timesteps // timesteps_per_iter)
        t0 = time.time()
        for it in range(1, max_iter + 1):
            if weight_selection_algo == "gpi-ls":
                state = self.set_weight_support(state, linear_support.get_weight_support())
                evaluator = lambda ws: self.eval_weights_values_padded(
                    state, ws, num_eval_episodes_for_front, max_steps
                )
                w = linear_support.next_weight("gpi-ls", gpi_evaluator=evaluator)
            else:
                w = linear_support.next_weight("ols")
            if w is None:
                break
            M = (
                linear_support.get_weight_support() + linear_support.get_corner_weights(top_k=4) + [w]
                if weight_selection_algo == "gpi-ls"
                else linear_support.get_weight_support() + [w]
            )
            state = self.set_weight_support(state, M)
            state = state._replace(task_w=jnp.tile(jnp.asarray(w, dtype=jnp.float32)[None], (cfg.num_envs, 1)))
            iters = max(1, timesteps_per_iter // cfg.num_envs)
            state = self.train_segment(state, iters, weight_selection_algo == "gpi-ls")

            M_arr = np.stack(unique_tol([np.asarray(m) for m in M]))
            values = self.eval_weights_values_padded(state, M_arr, num_eval_episodes_for_front, max_steps)
            for wcw, val in zip(M_arr, values):
                linear_support.add_solution(val, wcw)
            state = self.set_weight_support(state, linear_support.get_weight_support())

            if ref_point is not None:
                front = self.eval_weights_values_padded(
                    state, np.asarray(eval_weights), num_eval_episodes_for_front, max_steps
                )
                metrics = multi_policy_metrics(front, np.asarray(ref_point), np.asarray(eval_weights), known_pareto_front)
                metrics["charts/SPS"] = int(state.global_step) / (time.time() - t0)
                self.logger.log(metrics, int(state.global_step))
                self._last_front, self._last_metrics = front, metrics
        self._linear_support = linear_support
        return state
