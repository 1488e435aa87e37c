"""GPI-PD — GPI with Prioritization and learned Dynamics (model-based flagship).

TPU-native re-design of reference multi_policy/gpi_pd/gpi_pd.py:41-921
(Alegre et al., 2023), extending our GPILS with the model-based machinery:

- Probabilistic-ensemble dynamics fit every ``dynamics_train_freq`` env
  iterations on buffer data (reference :748-754).
- Dyna: imagined h-step rollouts from buffer states, actions by the GPI
  policy under sampled support weights, transitions filtered by ensemble
  uncertainty below a threshold into a second (imagined) device buffer
  (reference :367-414, 760-761).
- Updates draw mixed real+imagined batches (reference
  _sample_batch_experiences :343-365).
- PER priorities from the w-scalarized TD error; priorities reset when the
  task weight changes (reference :507-525, 619-660).

Host orchestrates sub-segments at dynamics boundaries; fit/rollout/learn are
each one jitted program.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

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
from .gpils import GPILS, GPILSConfig, GPILSState


@dataclass(frozen=True)
class GPIPDConfig(GPILSConfig):
    per: bool = True
    dyna: bool = True
    dynamics_train_freq: int = 250  # env-iterations between model fits
    dynamics_rollout_freq: int = 250
    dynamics_rollout_len: int = 1
    dynamics_rollout_starts: int = 512
    dynamics_uncertainty_threshold: float = 0.5
    dynamics_fit_samples: int = 4096
    dyna_batch_share: float = 0.5  # fraction of each update batch from imagined data
    dyna_buffer_size: int = 50_000
    ensemble: EnsembleConfig = EnsembleConfig(num_members=5, num_elites=2, epochs=10)


class GPIPDState(NamedTuple):
    base: GPILSState
    dyna_buffer: ReplayBuffer
    ens: EnsembleState


class GPIPD(GPILS):
    def __init__(self, env: MOEnv, config: GPIPDConfig = GPIPDConfig(), log: bool = False):
        super().__init__(env, config, log=log)
        self.cfg: GPIPDConfig = config
        # model input: obs ⊕ one-hot action; output: delta_obs ⊕ reward_vec
        self.dynamics = ProbabilisticEnsemble(
            input_dim=self.obs_dim + env.num_actions,
            output_dim=self.obs_dim + self.reward_dim,
            cfg=config.ensemble,
        )
        self.model_env = ModelEnv(self.dynamics, termination_fn=get_termination_fn(env.name))

    def init_state(self, key: jax.Array | None = None) -> GPIPDState:  # type: ignore[override]
        key = key if key is not None else jax.random.key(self.cfg.seed)
        kb, kd, key = jax.random.split(key, 3)
        base = super().init_state(kb)
        dyna_buffer = ReplayBuffer.create(
            self.cfg.dyna_buffer_size, obs_dim=self.obs_dim, reward_dim=self.reward_dim
        )
        return GPIPDState(base=base, dyna_buffer=dyna_buffer, ens=self.dynamics.init_state(kd))

    # ----------------------------------------------------------- model phase

    @partial(jax.jit, static_argnums=(0,))
    def fit_dynamics(self, state: GPIPDState, key: jax.Array):
        """Fit ensemble on a fixed-size sample of real transitions (reference :748-754).

        Rows are sampled UNIFORMLY even under PER: the model must fit the
        data distribution, not the TD-error distribution (the reference fits
        on the whole buffer)."""
        k1, k2 = jax.random.split(key)
        buf = state.base.buffer
        idx = jax.random.randint(k1, (self.cfg.dynamics_fit_samples,), 0, jnp.maximum(buf.size, 1))
        batch = jax.tree.map(lambda x: x[idx], buf.data)
        a_onehot = jax.nn.one_hot(batch.action.astype(jnp.int32), self.env.num_actions)
        X = jnp.concatenate([batch.obs, a_onehot], axis=-1)
        Y = jnp.concatenate([batch.next_obs - batch.obs, batch.reward], axis=-1)
        ens, loss = self.dynamics.fit(state.ens, X, Y, k2)
        return state._replace(ens=ens), loss

    @partial(jax.jit, static_argnums=(0,))
    def rollout_dynamics(self, state: GPIPDState, key: jax.Array):
        """Imagined GPI rollouts filtered by uncertainty (reference :367-414)."""
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
            actions = self._gpi_actions(base.ts.params, obs, w, base.support, base.support_size)
            next_obs, reward, term, unc = self.model_env.step(state.ens, obs, jax.nn.one_hot(actions, self.env.num_actions), km)
            # rollouts stop at termination (reference nonterm_mask,
            # gpi_pd.py:395-399): the terminal transition itself is kept, but
            # finished rows are frozen and never stepped/stored again.
            keep = (unc <= cfg.dynamics_uncertainty_threshold) & alive
            # keep-filter under static shapes: dropped rows become duplicates
            # of kept rows (the reference drops them host-side, :367-414);
            # skip the insert entirely when nothing clears the threshold.
            repl = jnp.where(keep, jnp.arange(keep.shape[0]), jnp.argmax(keep))
            tr = Transition(
                obs=obs[repl],
                action=actions[repl],
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
    def train_segment_pd(self, state: GPIPDState, num_iters: int, change_w_every_episode: bool = True):
        """GPILS segment whose updates draw mixed real+imagined batches."""
        cfg = self.cfg
        dyna_buffer = state.dyna_buffer
        n_im = int(cfg.batch_size * cfg.dyna_batch_share) if cfg.dyna else 0
        n_real = cfg.batch_size - n_im

        def body(s: GPILSState, _):
            import optax

            from ..utils.schedules import linearly_decaying_value

            key, k_eps, k_act, k_step, k_w, k_upd = jax.random.split(s.key, 6)
            eps = self._epsilon(s.global_step)
            greedy = self._gpi_actions(s.ts.params, s.obs, s.task_w, s.support, s.support_size)
            rand_a = jax.random.randint(k_act, (cfg.num_envs,), 0, self.env.num_actions)
            explore = jax.random.uniform(k_eps, (cfg.num_envs,)) < eps
            actions = jnp.where(explore, rand_a, greedy)

            out = self.venv.step(s.env_state, actions, k_step)
            done = out.terminated | out.truncated
            stats, _fin = s.stats.update(out.reward, done, cfg.gamma)
            buffer = s.buffer.add_batch(
                Transition(
                    obs=s.obs,
                    action=actions,
                    reward=out.reward,
                    next_obs=out.final_obs,
                    terminated=out.terminated.astype(jnp.float32),
                )
            )
            if change_w_every_episode:
                idx = jax.random.randint(k_w, (cfg.num_envs,), 0, s.support_size)
                task_w = jnp.where(done[:, None], s.support[idx], s.task_w)
            else:
                task_w = s.task_w
            global_step = s.global_step + cfg.num_envs
            iter_count = s.iter_count + 1

            def do_update(args):
                ts, buffer = args

                def one(carry, k):
                    ts, buffer = carry
                    kb, kd, kw2, ku = jax.random.split(k, 4)
                    half = cfg.batch_size // 2
                    if cfg.per:
                        real, idxb, _ = buffer.sample(kb, n_real)
                    else:
                        real = buffer.sample(kb, n_real)
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
                    # per-row current task weights: with per-episode weight
                    # resampling the env weights diverge, so sample across envs
                    kw1, kw2 = jax.random.split(kw2)
                    w1 = task_w[jax.random.randint(kw1, (half,), 0, cfg.num_envs)]
                    sidx = jax.random.randint(kw2, (cfg.batch_size - half,), 0, s.support_size)
                    w = jnp.concatenate([w1, s.support[sidx]], axis=0)
                    ts, loss, td_w = self._update(ts, batch, w, ku)
                    if cfg.per:
                        prio = jnp.clip(td_w[:n_real], cfg.min_priority) ** cfg.per_alpha
                        buffer = buffer.update_priorities(idxb, prio)
                    return (ts, buffer), loss

                keys = jax.random.split(k_upd, cfg.gradient_updates)
                (ts, buffer), _ = jax.lax.scan(one, (ts, buffer), keys)
                return ts, buffer

            can_learn = (global_step >= cfg.learning_starts) & (iter_count % cfg.train_freq == 0)
            ts, buffer = jax.lax.cond(can_learn, do_update, lambda a: a, (s.ts, buffer))
            ts = jax.lax.cond(
                iter_count % cfg.target_net_update_freq == 0,
                lambda t: t.replace(target_params=t.params),
                lambda t: t,
                ts,
            )
            return (
                s._replace(
                    ts=ts, buffer=buffer, env_state=out.state, obs=out.obs, task_w=task_w,
                    stats=stats, key=key, global_step=global_step, iter_count=iter_count,
                ),
                None,
            )

        base, _ = jax.lax.scan(body, state.base, None, length=num_iters)
        return state._replace(base=base)

    # ---------------------------------------------------------- orchestration

    def train(self, total_timesteps: int, **kwargs):  # type: ignore[override]
        """GPI-PD outer loop: LinearSupport + per-sub-segment dynamics phases."""
        state = kwargs.pop("state", None) or self.init_state()
        return self._train_outer(state, total_timesteps, **kwargs)

    def _train_outer(
        self,
        state: GPIPDState,
        total_timesteps: int,
        ref_point: np.ndarray | None = None,
        known_pareto_front: np.ndarray | None = None,
        num_eval_weights_for_front: int = 32,
        num_eval_episodes_for_front: int = 1,
        timesteps_per_iter: int = 10_000,
        weight_selection_algo: str = "gpi-ls",
        eval_max_steps: int | None = None,
    ) -> GPIPDState:
        import time

        from ..core.weights import equally_spaced_weights
        from ..evaluation.evaluation import multi_policy_metrics
        from ..outer.linear_support import LinearSupport
        from ..utils.schedules import unique_tol

        cfg = self.cfg
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
        # modulo on the per-iteration done_iters clock: with unequal freqs the
        # modulo only fires when freq is a multiple of the sub-segment stride.
        # Initialized at their freqs so the first eligible check fires.
        since_fit = self.cfg.dynamics_train_freq
        since_rollout = self.cfg.dynamics_rollout_freq
        for it in range(1, max_iter + 1):
            base = state.base
            if weight_selection_algo == "gpi-ls":
                base = self.set_weight_support(base, linear_support.get_weight_support())
                state = state._replace(base=base)
                evaluator = lambda ws: self.eval_weights_values_padded(
                    state.base, ws, num_eval_episodes_for_front, max_steps
                )
                w = linear_support.next_weight("gpi-ls", gpi_evaluator=evaluator)
            else:
                w = linear_support.next_weight("ols")
            if w is None:
                break
            M = (
                linear_support.get_weight_support()
                + linear_support.get_corner_weights(top_k=4)
                + [w]
                if weight_selection_algo == "gpi-ls"
                else linear_support.get_weight_support() + [w]
            )
            base = self.set_weight_support(state.base, M)
            base = base._replace(task_w=jnp.tile(jnp.asarray(w, dtype=jnp.float32)[None], (cfg.num_envs, 1)))
            # priority reset on new task weight (reference :619-660)
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
            values = self.eval_weights_values_padded(
                state.base, M_arr, num_eval_episodes_for_front, max_steps
            )
            for wcw, val in zip(M_arr, values):
                linear_support.add_solution(val, wcw)
            state = state._replace(base=self.set_weight_support(state.base, linear_support.get_weight_support()))

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
