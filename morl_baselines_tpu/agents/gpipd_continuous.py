"""GPI-PD continuous-action — model-based GPI with prioritization (TD3).

TPU-native counterpart of reference
multi_policy/gpi_pd/gpi_pd_continuous_action.py:34-713 with ``dyna=True`` /
``per=True`` (the reference's GPIPDContinuousAction; its GPILSContinuousAction
subclass is our ``GPILSContinuous``).  Extends ``GPILSContinuous`` with the
model-based machinery, composed exactly like the discrete ``GPIPD``:

- Probabilistic-ensemble dynamics on (obs ⊕ action) -> (Δobs ⊕ reward_vec),
  fit every ``dynamics_train_freq`` env iterations (reference :487-500).
- Dyna: imagined rollouts from buffer states, actions from the conditioned
  actor under support-sampled weights plus exploration noise, transitions
  kept below an ensemble-uncertainty threshold in a second device buffer
  (reference :502-539).
- Updates draw mixed real+imagined batches (reference :541-560).
- PER with w-scalarized TD priorities; priorities reset when the task weight
  changes (reference :405-420, 585-600).

Terminations inside imagined rollouts resolve from the env name
(``models.dynamics.get_termination_fn``, the reference's hand-written
termination_fn_* table, common/model_based/utils.py:13-102); pass
``termination_fn`` explicitly for custom envs.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..envs.base import MOEnv
from ..models.dynamics import (
    EnsembleConfig,
    EnsembleState,
    ModelEnv,
    ProbabilisticEnsemble,
    get_termination_fn,
)
from ..replay.buffer import ReplayBuffer, Transition
from ..replay.prioritized import PrioritizedReplayBuffer
from .gpils_continuous import GPILSContinuous, GPILSContinuousConfig, GPILSContState


@dataclass(frozen=True)
class GPIPDContinuousConfig(GPILSContinuousConfig):
    per: bool = True
    min_priority: float = 0.1
    per_alpha: float = 0.6
    dyna: bool = True
    dynamics_train_freq: int = 250  # env-iterations between model fits
    dynamics_rollout_freq: int = 250
    dynamics_rollout_len: int = 5
    dynamics_rollout_starts: int = 512
    dynamics_uncertainty_threshold: float = 2.0
    # reference protocol: whole-buffer fit with holdout early stopping
    # (probabilistic_ensemble.py:196-290); False = legacy fixed-budget fit
    dynamics_fit_to_convergence: bool = True
    dynamics_fit_samples: int = 4096  # legacy fixed-budget path only
    dyna_batch_share: float = 0.5  # fraction of each update batch from imagined data
    dyna_buffer_size: int = 50_000
    ensemble: EnsembleConfig = EnsembleConfig(num_members=5, num_elites=2, epochs=10)


class GPIPDContState(NamedTuple):
    base: GPILSContState
    dyna_buffer: ReplayBuffer
    ens: EnsembleState


class GPIPDContinuous(GPILSContinuous):
    def __init__(
        self,
        env: MOEnv,
        config: GPIPDContinuousConfig = GPIPDContinuousConfig(),
        log: bool = False,
        termination_fn: Callable | None = None,
    ):
        super().__init__(env, config, log=log)
        self.cfg: GPIPDContinuousConfig = config
        self.dynamics = ProbabilisticEnsemble(
            input_dim=self.obs_dim + self.action_dim,
            output_dim=self.obs_dim + self.reward_dim,
            cfg=config.ensemble,
        )
        self.model_env = ModelEnv(
            self.dynamics,
            termination_fn=termination_fn if termination_fn is not None else get_termination_fn(env.name),
        )

    def init_state(self, key: jax.Array | None = None) -> GPIPDContState:  # type: ignore[override]
        cfg = self.cfg
        key = key if key is not None else jax.random.key(cfg.seed)
        kb, kd, key = jax.random.split(key, 3)
        base = super().init_state(kb)
        if cfg.per:
            base = base._replace(
                buffer=PrioritizedReplayBuffer.create(
                    cfg.buffer_size, obs_dim=self.obs_dim, action_shape=(self.action_dim,),
                    reward_dim=self.reward_dim, action_dtype=jnp.float32,
                )
            )
        dyna_buffer = ReplayBuffer.create(
            cfg.dyna_buffer_size, obs_dim=self.obs_dim, action_shape=(self.action_dim,),
            reward_dim=self.reward_dim, action_dtype=jnp.float32,
        )
        return GPIPDContState(base=base, dyna_buffer=dyna_buffer, ens=self.dynamics.init_state(kd))

    # ----------------------------------------------------------- model phase

    @partial(jax.jit, static_argnums=(0,))
    def fit_dynamics(self, state: GPIPDContState, key: jax.Array):
        """Fit ensemble on real transitions (reference :487-500).

        Default (``dynamics_fit_to_convergence``): the reference's whole-buffer
        fit with per-member bootstrap and holdout early stopping.  Legacy
        path: fixed-budget fit on uniformly sampled rows (uniform even under
        PER: the model must fit the data distribution, not the TD-error
        distribution)."""
        buf = state.base.buffer
        if self.cfg.dynamics_fit_to_convergence:
            X = jnp.concatenate([buf.data.obs, buf.data.action], axis=-1)
            Y = jnp.concatenate([buf.data.next_obs - buf.data.obs, buf.data.reward], axis=-1)
            ens, loss, _epochs = self.dynamics.fit_converged(state.ens, X, Y, buf.size, key)
            return state._replace(ens=ens), loss
        k1, k2 = jax.random.split(key)
        idx = jax.random.randint(k1, (self.cfg.dynamics_fit_samples,), 0, jnp.maximum(buf.size, 1))
        batch = jax.tree.map(lambda x: x[idx], buf.data)
        X = jnp.concatenate([batch.obs, batch.action], axis=-1)
        Y = jnp.concatenate([batch.next_obs - batch.obs, batch.reward], axis=-1)
        ens, loss = self.dynamics.fit(state.ens, X, Y, k2)
        return state._replace(ens=ens), loss

    @partial(jax.jit, static_argnums=(0,))
    def rollout_dynamics(self, state: GPIPDContState, key: jax.Array):
        """Imagined actor rollouts filtered by uncertainty (reference :502-539)."""
        cfg = self.cfg
        base = state.base
        k_obs, k_w, key = jax.random.split(key, 3)
        obs = base.buffer.sample_obs(k_obs, cfg.dynamics_rollout_starts)
        widx = jax.random.randint(k_w, (cfg.dynamics_rollout_starts,), 0, base.support_size)
        w = base.support[widx]
        dyna = state.dyna_buffer

        def step(carry, k):
            obs, alive, dyna = carry
            ka, km = jax.random.split(k)
            acts = self._actor_fwd(base.actor_ts, obs, w)
            acts = jnp.clip(
                acts + jax.random.normal(ka, acts.shape) * cfg.exploration_noise, -1.0, 1.0
            )
            next_obs, reward, term, unc = self.model_env.step(state.ens, obs, acts, km)
            # rollouts stop at termination (reference nonterm_mask,
            # gpi_pd_continuous_action.py:357-361): the terminal transition is
            # kept, but finished rows are frozen and never stepped/stored again
            # — post-terminal states are invalid for terminating envs (hopper).
            keep = (unc <= cfg.dynamics_uncertainty_threshold) & alive
            # keep-filter under static shapes: dropped rows become duplicates
            # of kept rows (the reference drops them host-side, :502-539);
            # skip the insert entirely when nothing clears the threshold.
            repl = jnp.where(keep, jnp.arange(keep.shape[0]), jnp.argmax(keep))
            tr = Transition(
                obs=obs[repl],
                action=acts[repl],
                reward=reward[repl],
                next_obs=next_obs[repl],
                terminated=term.astype(jnp.float32)[repl],
            )
            dyna = jax.lax.cond(jnp.any(keep), lambda d: d.add_batch(tr), lambda d: d, dyna)
            alive = alive & ~term
            next_obs = jnp.where(alive[:, None], next_obs, obs)
            return (next_obs, alive, dyna), jnp.mean(unc)

        alive0 = jnp.ones((cfg.dynamics_rollout_starts,), dtype=bool)
        (obs, _alive, dyna), mean_unc = jax.lax.scan(
            step, (obs, alive0, dyna), jax.random.split(key, cfg.dynamics_rollout_len)
        )
        return state._replace(dyna_buffer=dyna), jnp.mean(mean_unc)

    # ----------------------------------------------------------- learn phase

    @partial(jax.jit, static_argnums=(0, 2, 3))
    def train_segment_pd(self, state: GPIPDContState, num_iters: int, change_w_every_episode: bool = True):
        """GPILSContinuous segment whose updates draw mixed real+imagined
        batches and feed PER priorities back (reference :541-600)."""
        cfg = self.cfg
        dyna_buffer = state.dyna_buffer
        n_im = int(cfg.batch_size * cfg.dyna_batch_share) if cfg.dyna else 0
        n_real = cfg.batch_size - n_im

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
                    kb, kd, kw1, kw2, kw3, ku = jax.random.split(k, 6)
                    if cfg.per:
                        real, idxb, _ = s3.buffer.sample(kb, n_real)
                    else:
                        real = s3.buffer.sample(kb, n_real)
                    if n_im > 0:
                        im = dyna_buffer.sample(kd, n_im)
                        # before any imagined data exists, substitute real rows
                        # (tiled when n_im > n_real)
                        ridx = jnp.arange(n_im) % n_real
                        fallback = jax.tree.map(lambda x: x[ridx], real)
                        has_im = dyna_buffer.size > 0
                        im = jax.tree.map(lambda a, b: jnp.where(has_im, a, b), im, fallback)
                        batch = jax.tree.map(lambda a, b: jnp.concatenate([a, b]), real, im)
                    else:
                        batch = real
                    half = cfg.batch_size // 2
                    w1 = s3.task_w[jax.random.randint(kw1, (half,), 0, cfg.num_envs)]
                    sidx = jax.random.randint(kw2, (cfg.batch_size - half,), 0, s3.support_size)
                    w = jnp.concatenate([w1, s3.support[sidx]], axis=0)
                    # decorrelate weight assignment from the [real | imagined]
                    # batch order (see gpipd.py: support-weight Qs must not
                    # train exclusively on imagined rows)
                    w = jax.random.permutation(kw3, w)
                    s3, td_w = self._update(s3, batch, w, ku)
                    if cfg.per:
                        prio = jnp.clip(td_w[:n_real], cfg.min_priority) ** cfg.per_alpha
                        s3 = s3._replace(buffer=s3.buffer.update_priorities(idxb, prio))
                    return s3, None

                s2, _ = jax.lax.scan(one, s2, jax.random.split(k_upd, cfg.gradient_updates))
                return s2

            s = jax.lax.cond(s.global_step >= cfg.learning_starts, do_update, lambda x: x, s)
            return s, None

        base, _ = jax.lax.scan(body, state.base, None, length=num_iters)
        return state._replace(base=base)

    # ---------------------------------------------------------- orchestration

    def train(  # type: ignore[override]
        self,
        total_timesteps: int,
        ref_point: np.ndarray | None = None,
        known_pareto_front: np.ndarray | None = None,
        num_eval_weights_for_front: int = 32,
        num_eval_episodes_for_front: int = 1,
        timesteps_per_iter: int = 10_000,
        weight_selection_algo: str = "gpi-ls",
        eval_max_steps: int | None = None,
        state: GPIPDContState | None = None,
    ) -> GPIPDContState:
        """LinearSupport outer loop with dynamics fit/rollout phases between
        learner sub-segments (mirrors the discrete GPIPD._train_outer)."""
        from ..core.weights import equally_spaced_weights
        from ..evaluation.evaluation import multi_policy_metrics
        from ..outer.linear_support import LinearSupport
        from ..utils.schedules import unique_tol

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
        # steps-since counters (persist across outer iterations) instead of
        # modulo on the per-iteration done_iters clock — see GPIPD._train_outer.
        since_fit = cfg.dynamics_train_freq
        since_rollout = cfg.dynamics_rollout_freq
        for it in range(1, max_iter + 1):
            if weight_selection_algo == "gpi-ls":
                state = state._replace(
                    base=self.set_weight_support(state.base, linear_support.get_weight_support())
                )
                evaluator = lambda ws: self.eval_weights_values_padded(
                    state.base, ws, num_eval_episodes_for_front, max_steps
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
            base = self.set_weight_support(state.base, M)
            base = base._replace(task_w=jnp.tile(jnp.asarray(w, dtype=jnp.float32)[None], (cfg.num_envs, 1)))
            # priority reset on new task weight (reference :585-600)
            if cfg.per:
                base = base._replace(buffer=base.buffer.reset_priorities())
            state = state._replace(base=base)

            # sub-segments punctuated by dynamics fits/rollouts on their own
            # cadences (reference dynamics_train_freq / dynamics_rollout_freq)
            iters = max(1, timesteps_per_iter // cfg.num_envs)
            sub = max(1, min(cfg.dynamics_train_freq, cfg.dynamics_rollout_freq, iters))
            done_iters = 0
            while done_iters < iters:
                n = min(sub, iters - done_iters)
                if cfg.dyna and int(state.base.buffer.size) >= cfg.dynamics_fit_samples // 4:
                    if since_fit >= cfg.dynamics_train_freq:
                        state, _loss = self.fit_dynamics(state, jax.random.key(int(state.base.global_step) + 1))
                        since_fit -= cfg.dynamics_train_freq
                    if since_rollout >= cfg.dynamics_rollout_freq:
                        state, _unc = self.rollout_dynamics(state, jax.random.key(int(state.base.global_step) + 2))
                        since_rollout -= cfg.dynamics_rollout_freq
                state = self.train_segment_pd(state, n, weight_selection_algo == "gpi-ls")
                done_iters += n
                since_fit += n
                since_rollout += n

            M_arr = np.stack(unique_tol([np.asarray(m) for m in M]))
            values = self.eval_weights_values_padded(state.base, M_arr, num_eval_episodes_for_front, max_steps)
            for wcw, val in zip(M_arr, values):
                linear_support.add_solution(val, wcw)
            state = state._replace(
                base=self.set_weight_support(state.base, linear_support.get_weight_support())
            )

            if ref_point is not None:
                front = self.eval_weights_values_padded(
                    state.base, np.asarray(eval_weights), num_eval_episodes_for_front, max_steps
                )
                metrics = multi_policy_metrics(front, np.asarray(ref_point), np.asarray(eval_weights), known_pareto_front)
                metrics["charts/SPS"] = int(state.base.global_step) / (time.time() - t0)
                self.logger.log(metrics, int(state.base.global_step))
                self._last_front, self._last_metrics = front, metrics
        self._linear_support = linear_support
        return state
