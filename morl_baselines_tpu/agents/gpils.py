"""GPI-LS — Generalized Policy Improvement with Linear Support (discrete).

TPU-native re-design of the reference's flagship algorithm
(reference multi_policy/gpi_ls_jax/gpi_ls_jax.py:33-830 — the repo's own JAX
implementation — and its torch twin multi_policy/gpi_pd/gpi_pd.py:41-921;
Alegre et al., 2023).  Semantics kept:

- psi-network ensemble Q(s, a, w) in R^{A x d}: obs-feature x weight-feature
  product, n_critics unshared param sets via nn.vmap, DroQ dropout+layernorm
  (reference gpi_ls_jax.py:33-128).
- DroQ target: 2 critics (sampled if more), min over critics of scalarized
  next-Q, greedy action on the min-psi values (reference :359-381).
- Batch weights: half the current task weight, half sampled from the weight
  support M (reference one_update :427-433).
- GPI behavior policy/eval: argmax over policies w' in M of max_a w·Q(s,a,w')
  (reference gpi_action :573-588); per-episode task-weight resampling from M.
- Outer loop: LinearSupport corner weights with GPI-LS priorities; per
  iteration the support is CCS weights + top-4 corner weights + w
  (reference train :780-830).

Inversion vs the reference: the buffer lives on device and a whole
train_iteration segment (act -> step -> store -> update x gradient_updates)
is one lax.scan; GPI evaluation over corner weights is one vmapped rollout
batch instead of per-weight python episodes (SURVEY §3.2's host round-trip
is gone).
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
from ..envs.base import MOEnv
from ..envs.vector import EpisodeStats, VectorMOEnv
from ..evaluation.evaluation import multi_policy_metrics, policy_evaluation
from ..models.networks import TrainState, WeightConditionedQNet, ensemble
from ..outer.linear_support import LinearSupport
from ..replay.buffer import ReplayBuffer, Transition
from ..replay.prioritized import PrioritizedReplayBuffer
from ..utils.schedules import linearly_decaying_value, unique_tol
from .base import MOAgentBase


@dataclass(frozen=True)
class GPILSConfig:
    learning_rate: float = 3e-4
    gamma: float = 0.98
    batch_size: int = 128
    buffer_size: int = 100_000
    num_envs: int = 32
    learning_starts: int = 200
    gradient_updates: int = 10
    train_freq: int = 1
    target_net_update_freq: int = 200  # env-iterations
    tau: float = 1.0
    n_critics: int = 2
    dropout_rate: float = 0.01
    use_layernorm: bool = True
    hidden: tuple = (256, 256, 256, 256)
    initial_epsilon: float = 1.0
    final_epsilon: float = 0.05
    epsilon_decay_steps: int = 50_000
    max_grad_norm: float | None = None
    min_priority: float = 0.01
    per: bool = False
    per_alpha: float = 0.6
    max_support: int = 32  # fixed capacity of the weight-support set M
    use_gpi: bool = True
    gpi_type: str = "gpi"  # "gpi" | "ugpi" (pessimistic, reference gpi_ls_jax.py:534)
    pessimism: float = 0.95
    bf16_act: bool = False  # bfloat16 GEMMs in the (N x M) GPI action forward only
    seed: int = 0


class GPILSState(NamedTuple):
    ts: TrainState
    buffer: ReplayBuffer | PrioritizedReplayBuffer
    env_state: tuple
    obs: jnp.ndarray
    task_w: jnp.ndarray  # (N, d) current per-env task weight (resampled from M at done)
    support: jnp.ndarray  # (M_cap, d) weight support
    support_size: jnp.ndarray  # int32
    stats: EpisodeStats
    key: jax.Array
    global_step: jnp.ndarray
    iter_count: jnp.ndarray


class GPILS(MOAgentBase):
    def __init__(self, env: MOEnv, config: GPILSConfig = GPILSConfig(), log: bool = False):
        super().__init__(env, config, log=log)
        self.cfg = config
        self.venv = VectorMOEnv(env, config.num_envs)
        self.q_net = ensemble(
            WeightConditionedQNet,
            config.n_critics,
            num_actions=env.num_actions,
            reward_dim=env.reward_dim,
            hidden=config.hidden,
            dropout_rate=config.dropout_rate,
            use_layernorm=config.use_layernorm,
        )
        # same params, bf16 compute — used only for action selection (the
        # per-step (N*M)-row forward), never for TD/update math: Q argmax
        # ranking tolerates bf16; TD targets stay f32.
        self.q_net_act = (
            ensemble(
                WeightConditionedQNet,
                config.n_critics,
                num_actions=env.num_actions,
                reward_dim=env.reward_dim,
                hidden=config.hidden,
                dropout_rate=config.dropout_rate,
                use_layernorm=config.use_layernorm,
                dtype=jnp.bfloat16,
            )
            if config.bf16_act
            else self.q_net
        )

    # ------------------------------------------------------------------ init

    def init_state(self, key: jax.Array | None = None) -> GPILSState:
        cfg = self.cfg
        key = key if key is not None else jax.random.key(cfg.seed)
        kp, ke, key = jax.random.split(key, 3)
        dummy = (jnp.zeros((1, self.obs_dim)), jnp.zeros((1, self.reward_dim)))
        params = self.q_net.init(kp, *dummy, True)
        tx_parts = [optax.adam(cfg.learning_rate)]
        if cfg.max_grad_norm is not None:
            tx_parts.insert(0, optax.clip_by_global_norm(cfg.max_grad_norm))
        ts = TrainState.create(
            apply_fn=self.q_net.apply, params=params, target_params=params, tx=optax.chain(*tx_parts)
        )
        buf_cls = PrioritizedReplayBuffer if cfg.per else ReplayBuffer
        buffer = buf_cls.create(cfg.buffer_size, obs_dim=self.obs_dim, reward_dim=self.reward_dim)
        env_state, obs = self.venv.reset(ke)
        d = self.reward_dim
        support = jnp.zeros((cfg.max_support, d))
        support = support.at[0].set(jnp.ones((d,)) / d)
        return GPILSState(
            ts=ts,
            buffer=buffer,
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

    # --------------------------------------------------------------- support

    def set_weight_support(self, state: GPILSState, weights: list[np.ndarray]) -> GPILSState:
        """Host-side: install the (deduped, reference utils.unique_tol) support set."""
        ws = unique_tol([np.asarray(w) for w in weights])[: self.cfg.max_support]
        support = np.zeros((self.cfg.max_support, self.reward_dim), dtype=np.float32)
        for i, w in enumerate(ws):
            support[i] = w
        return state._replace(
            support=jnp.asarray(support), support_size=jnp.int32(max(len(ws), 1))
        )

    # ------------------------------------------------------------------- act

    def _q_values(self, params, obs, w, key=None):
        """(n_critics, B, A, d) forward; deterministic (no dropout) for acting.

        Runs through ``q_net_act`` (bf16 GEMMs when cfg.bf16_act) — action
        selection only; update/TD paths call ``q_net`` directly in f32."""
        return self.q_net_act.apply(params, obs, w, True)

    def _gpi_actions(self, params, obs, w, support, support_size):
        """Batched GPI action: argmax over valid support policies of max_a w·Q.

        obs (N, O), w (N, d), support (M, d).  One (N*M)-row forward.
        Reference gpi_action :573-588, vectorized over the env batch.
        """
        N = obs.shape[0]
        M = support.shape[0]
        obs_nm = jnp.repeat(obs, M, axis=0)
        sup_nm = jnp.tile(support, (N, 1))
        psi = self._q_values(params, obs_nm, sup_nm)  # (C, N*M, A, d)
        psi = psi.mean(axis=0).reshape(N, M, -1, self.reward_dim)
        q = jnp.einsum("nd,nmad->nma", w, psi)
        valid = (jnp.arange(M) < support_size)[None, :, None]
        q = jnp.where(valid, q, -jnp.inf)
        max_a = jnp.max(q, axis=2)  # (N, M)
        pol = jnp.argmax(max_a, axis=1)  # (N,)
        return jnp.argmax(jnp.take_along_axis(q, pol[:, None, None], axis=1).squeeze(1), axis=1)

    def _max_actions(self, params, obs, w):
        psi = self._q_values(params, obs, w)  # (C, N, A, d)
        q = jnp.einsum("nd,cnad->cna", w, psi).mean(axis=0)
        return jnp.argmax(q, axis=-1)

    # Student-t critical values at n=10, as the reference hardcodes
    # (gpi_ls_jax.py ugpi_action :556-563)
    _TINV = {0.9: 1.383029, 0.95: 1.833113, 0.99: 2.821438}

    def _ugpi_actions(self, params, obs, w, support, support_size, pessimism: float = 0.95):
        """Uncertainty-aware GPI: lower-confidence-bound Q over the critic
        ensemble before the max over support policies (reference ugpi_action
        gpi_ls_jax.py:534-570)."""
        N = obs.shape[0]
        M = support.shape[0]
        obs_nm = jnp.repeat(obs, M, axis=0)
        sup_nm = jnp.tile(support, (N, 1))
        psi = self._q_values(params, obs_nm, sup_nm)  # (C, N*M, A, d)
        q = jnp.einsum("nd,cnmad->cnma", w, psi.reshape(psi.shape[0], N, M, -1, self.reward_dim))
        n_crit = q.shape[0]
        if pessimism == 1.0:
            q_lcb = q.mean(axis=0) - q.std(axis=0)
        else:
            tinv = self._TINV.get(pessimism, 1.833113)
            q_lcb = q.mean(axis=0) - q.std(axis=0) / jnp.sqrt(float(n_crit)) * tinv
        valid = (jnp.arange(M) < support_size)[None, :, None]
        q_lcb = jnp.where(valid, q_lcb, -jnp.inf)
        pol = jnp.argmax(jnp.max(q_lcb, axis=2), axis=1)
        return jnp.argmax(jnp.take_along_axis(q_lcb, pol[:, None, None], axis=1).squeeze(1), axis=1)

    # ---------------------------------------------------------------- update

    def _update(self, ts: TrainState, batch: Transition, w: jnp.ndarray, key: jax.Array):
        """DroQ/min-ensemble update (reference _update_q :341-403)."""
        ts, loss, tds, _target_psi = self._update_with_aux(ts, batch, w, key)
        # PER priority: max over critics of |w·td| (reference one_update :470-472)
        td_w = jnp.max(jnp.abs(jnp.einsum("cbd,bd->cb", tds, w)), axis=0)
        return ts, loss, td_w

    def _update_with_aux(self, ts: TrainState, batch: Transition, w: jnp.ndarray, key: jax.Array):
        """Core TD step; also returns the raw per-critic TD errors (C, B, d)
        and the bootstrap target (B, d) so subclasses (GPIPD) can derive
        alternative priorities without a second forward."""
        cfg = self.cfg
        k_inds, k_drop_t, k_drop, _ = jax.random.split(key, 4)
        psi_next = self.q_net.apply(
            ts.target_params, batch.next_obs, w, False, rngs={"dropout": k_drop_t}
        )  # (C, B, A, d)
        if cfg.n_critics > 2:
            inds = jax.random.randint(k_inds, (2,), 0, cfg.n_critics)
            psi_next = psi_next[inds]
        q_next = jnp.einsum("bd,cbad->cba", w, psi_next)
        min_inds = jnp.argmin(q_next, axis=0)  # (B, A)
        min_psi = jnp.take_along_axis(psi_next, min_inds[None, ..., None], axis=0).squeeze(0)  # (B, A, d)
        max_q = jnp.einsum("bd,bad->ba", w, min_psi)
        max_acts = jnp.argmax(max_q, axis=1)
        target_next = jnp.take_along_axis(min_psi, max_acts[:, None, None], axis=1).squeeze(1)
        target_psi = batch.reward + (1.0 - batch.terminated[:, None]) * cfg.gamma * target_next

        def loss_fn(params):
            psi = self.q_net.apply(params, batch.obs, w, False, rngs={"dropout": k_drop})
            psi_sa = jnp.take_along_axis(
                psi, batch.action[None, :, None, None].astype(jnp.int32), axis=2
            ).squeeze(2)  # (C, B, d)
            tds = psi_sa - target_psi[None]
            a = jnp.abs(tds)
            loss = jnp.where(a < cfg.min_priority, 0.5 * tds**2, a * cfg.min_priority)
            return loss.mean(), tds

        (loss, tds), grads = jax.value_and_grad(loss_fn, has_aux=True)(ts.params)
        ts = ts.apply_gradients(grads=grads)
        return ts, loss, tds, target_psi

    # ---------------------------------------------------------- train segment

    def _epsilon(self, global_step):
        # per-env step clock: keeps reference decay budgets meaningful at any
        # num_envs (see envelope._epsilon for the failure mode this avoids)
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

    @partial(jax.jit, static_argnums=(0, 2, 3, 4))
    def train_segment(
        self,
        state: GPILSState,
        num_iters: int,
        change_w_every_episode: bool = True,
        support_cap: int | None = None,
    ):
        """One device-resident segment of ``num_iters`` vector env steps.

        ``support_cap`` is a *static* upper bound on the weight-support size
        (next power of two of the actual size, chosen by the host outer loop):
        the per-step GPI action forward then runs over N*cap rows instead of
        N*max_support, which is the hot op of this agent (VERDICT round-1
        weak #2 — reference forwards over all M every step, gpi_ls_jax.py
        gpi_action :573-588).  Re-jits once per bucket.
        """
        cfg = self.cfg
        cap = support_cap or self.cfg.max_support

        def body(s: GPILSState, _):
            key, k_eps, k_act, k_step, k_w, k_upd = jax.random.split(s.key, 6)
            eps = self._epsilon(s.global_step)
            if cfg.use_gpi:
                greedy = self._gpi_actions(
                    s.ts.params, s.obs, s.task_w, s.support[:cap], jnp.minimum(s.support_size, cap)
                )
            else:
                greedy = self._max_actions(s.ts.params, s.obs, s.task_w)
            rand_a = jax.random.randint(k_act, (cfg.num_envs,), 0, self.env.num_actions)
            explore = jax.random.uniform(k_eps, (cfg.num_envs,)) < eps
            actions = jnp.where(explore, rand_a, greedy)

            out = self.venv.step(s.env_state, actions, k_step)
            done = out.terminated | out.truncated
            stats, _fin = s.stats.update(out.reward, done, cfg.gamma)

            tr = Transition(
                obs=s.obs,
                action=actions,
                reward=out.reward,
                next_obs=out.final_obs,
                terminated=out.terminated.astype(jnp.float32),
            )
            buffer = s.buffer.add_batch(tr)

            # per-episode task weight resampled uniformly from the support
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
                    kb, kw2, ku = jax.random.split(k, 3)
                    half = cfg.batch_size // 2
                    if cfg.per:
                        batch, idxb, _ = buffer.sample(kb, cfg.batch_size)
                    else:
                        batch = buffer.sample(kb, cfg.batch_size)
                    # half on current task weights, half on support samples.
                    # With change_w_every_episode the per-env task weights
                    # diverge, so sample the half-batch per-row across envs
                    # (reference one_update :427-433 has a single env and
                    # uses its single current w).
                    kw1, kw2 = jax.random.split(kw2)
                    w1 = task_w[jax.random.randint(kw1, (half,), 0, cfg.num_envs)]
                    sidx = jax.random.randint(kw2, (cfg.batch_size - half,), 0, s.support_size)
                    w2 = s.support[sidx]
                    w = jnp.concatenate([w1, w2], axis=0)
                    ts, loss, td_w = self._update(ts, batch, w, ku)
                    if cfg.per:
                        prio = jnp.clip(td_w, cfg.min_priority) ** cfg.per_alpha
                        buffer = buffer.update_priorities(idxb, prio)
                    return (ts, buffer), loss

                keys = jax.random.split(k_upd, cfg.gradient_updates)
                (ts, buffer), _losses = jax.lax.scan(one, (ts, buffer), keys)
                return ts, buffer

            can_learn = (global_step >= cfg.learning_starts) & (iter_count % cfg.train_freq == 0)
            ts, buffer = jax.lax.cond(can_learn, do_update, lambda a: a, (s.ts, buffer))

            if cfg.tau < 1.0:
                ts = ts.replace(target_params=optax.incremental_update(ts.params, ts.target_params, cfg.tau))
            else:
                ts = jax.lax.cond(
                    iter_count % cfg.target_net_update_freq == 0,
                    lambda t: t.replace(target_params=t.params),
                    lambda t: t,
                    ts,
                )

            return (
                s._replace(
                    ts=ts,
                    buffer=buffer,
                    env_state=out.state,
                    obs=out.obs,
                    task_w=task_w,
                    stats=stats,
                    key=key,
                    global_step=global_step,
                    iter_count=iter_count,
                ),
                None,
            )

        state, _ = jax.lax.scan(body, state, None, length=num_iters)
        return state

    # ------------------------------------------------------------------ eval

    def act_eval(self, params, support, support_size, obs, w, key=None):
        """GPI action for evaluation (single obs); ugpi applies the LCB ensemble bound."""
        if self.cfg.use_gpi:
            if self.cfg.gpi_type == "ugpi":
                return self._ugpi_actions(
                    params, obs[None], w[None], support, support_size, self.cfg.pessimism
                )[0]
            return self._gpi_actions(params, obs[None], w[None], support, support_size)[0]
        return self._max_actions(params, obs[None], w[None])[0]

    @partial(jax.jit, static_argnums=(0, 3, 4, 5))
    def eval_weights_values(
        self,
        state: GPILSState,
        weights: jnp.ndarray,
        rep: int,
        max_steps: int,
        support_cap: int | None = None,
        key=None,
    ):
        """Discounted GPI-policy value per weight — one vmapped program.

        Replaces the reference's per-corner-weight python evaluation loops
        (both LinearSupport gpi priorities and front logging).
        """
        cap = support_cap or self.cfg.max_support
        key = key if key is not None else jax.random.key(0)
        act = lambda obs, w, k: self.act_eval(
            state.ts.params, state.support[:cap], jnp.minimum(state.support_size, cap), obs, w
        )
        # NOTE: weights.shape[0] is a trace shape — callers with varying
        # weight counts should go through eval_weights_values_padded to avoid
        # a recompile per count.
        keys = jax.random.split(key, weights.shape[0])
        _, discs = jax.vmap(
            lambda w, k: policy_evaluation(self.env, act, w, k, rep, self.cfg.gamma, max_steps)
        )(weights, keys)
        return discs

    def eval_weights_values_padded(
        self, state, weights: np.ndarray, rep: int, max_steps: int, support_cap: int | None = None
    ) -> np.ndarray:
        """Host wrapper: pad the weight batch to the next power of two so the
        jitted vmapped evaluation compiles once per bucket instead of once per
        corner-weight count (the GPI-LS outer loop changes the count every
        iteration — unpadded, that recompiled the whole rollout each time)."""
        ws = np.asarray(weights, dtype=np.float32)
        n = ws.shape[0]
        m = 1 << max(0, (n - 1)).bit_length()
        if m > n:
            ws = np.concatenate([ws, np.tile(ws[-1:], (m - n, 1))], axis=0)
        vals = self.eval_weights_values(state, jnp.asarray(ws), rep, max_steps, support_cap)
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
        state: GPILSState | None = None,
    ) -> GPILSState:
        """Outer loop (reference gpi_ls_jax.py:708-830): LinearSupport drives
        which weights get trained; the inner iteration is device-resident."""
        cfg = self.cfg
        state = state if state is not None else self.init_state()
        max_steps = eval_max_steps or self.env.max_episode_steps or 500
        linear_support = LinearSupport(
            num_objectives=self.reward_dim,
            epsilon=0.0 if weight_selection_algo == "ols" else None,
        )
        eval_weights = jnp.asarray(
            equally_spaced_weights(self.reward_dim, num_eval_weights_for_front), dtype=jnp.float32
        )
        max_iter = max(1, total_timesteps // timesteps_per_iter)
        t0 = time.time()

        def _cap(state) -> int:
            # static power-of-two bucket for the GPI forward over the support
            n = max(1, int(state.support_size))
            return int(min(self.cfg.max_support, 1 << (n - 1).bit_length()))

        for it in range(1, max_iter + 1):
            # -- next weight
            if weight_selection_algo == "gpi-ls":
                state = self.set_weight_support(state, linear_support.get_weight_support())
                evaluator = lambda ws: self.eval_weights_values_padded(
                    state, ws, num_eval_episodes_for_front, max_steps, _cap(state)
                )
                w = linear_support.next_weight("gpi-ls", gpi_evaluator=evaluator)
            else:
                w = linear_support.next_weight("ols")
            if w is None:
                break
            # -- weight support M for this iteration
            if weight_selection_algo == "gpi-ls":
                M = linear_support.get_weight_support() + linear_support.get_corner_weights(top_k=4) + [w]
            else:
                M = linear_support.get_weight_support() + [w]
            state = self.set_weight_support(state, M)
            state = state._replace(task_w=jnp.tile(jnp.asarray(w, dtype=jnp.float32)[None], (cfg.num_envs, 1)))

            # -- inner device-resident iteration
            iters = max(1, timesteps_per_iter // cfg.num_envs)
            state = self.train_segment(state, iters, weight_selection_algo == "gpi-ls", _cap(state))

            # -- update CCS
            if weight_selection_algo == "ols":
                value = self.eval_weights_values_padded(
                    state, np.asarray(w)[None], num_eval_episodes_for_front, max_steps, _cap(state)
                )[0]
                linear_support.add_solution(value, w)
            else:
                M_arr = np.stack(unique_tol([np.asarray(m) for m in M]))
                values = self.eval_weights_values_padded(
                    state, M_arr, num_eval_episodes_for_front, max_steps, _cap(state)
                )
                for wcw, val in zip(M_arr, values):
                    linear_support.add_solution(val, wcw)
            state = self.set_weight_support(state, linear_support.get_weight_support())

            # -- front metrics
            if ref_point is not None:
                front = self.eval_weights_values_padded(
                    state, np.asarray(eval_weights), num_eval_episodes_for_front, max_steps, _cap(state)
                )
                metrics = multi_policy_metrics(
                    front, np.asarray(ref_point), np.asarray(eval_weights), known_pareto_front
                )
                metrics["charts/SPS"] = int(state.global_step) / (time.time() - t0)
                self.logger.log(metrics, int(state.global_step))
                self._last_front = front
                self._last_metrics = metrics
        self._linear_support = linear_support
        return state
