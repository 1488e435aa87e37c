"""Scalarized tabular MO Q-Learning — vectorized, fully on device.

TPU-native re-design of reference single_policy/ser/mo_q_learning.py:19-311
(Van Moffaert et al., 2013): a single table of Q-*vectors* q[s] in R^{AxD};
the greedy action maximizes the scalarized Q (reference :160-170); the TD
update is vector-valued with the bootstrap action chosen by scalarized argmax
at s' (reference :172-184).  Supports weighted-sum and Tchebicheff
scalarization (with explicit utopian state), and optional Dyna planning
backed by a dense tabular model (counterpart of common/model_based/
tabular_model.py — a (S, A) -> counts/next/reward array instead of dicts).

The re-design: N envs step in parallel; per step, N TD updates are applied
with a scatter-add of learning-rate-scaled deltas (standard vectorized
tabular Q-learning).  The entire train loop is one ``lax.scan``.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.scalarization import tchebicheff, update_utopian, weighted_sum
from ..envs.base import MOEnv
from ..envs.vector import EpisodeStats, VectorMOEnv
from ..evaluation.evaluation import policy_evaluation
from ..utils.schedules import linearly_decaying_value
from .base import MOAgentBase


@dataclass(frozen=True)
class MOQLearningConfig:
    learning_rate: float = 0.1
    gamma: float = 0.9
    initial_epsilon: float = 0.1
    final_epsilon: float = 0.1
    epsilon_decay_steps: int | None = None
    learning_starts: int = 0
    num_envs: int = 16
    scalarization: str = "weighted_sum"  # or "tchebicheff"
    dyna: bool = False
    dyna_updates: int = 5
    seed: int = 0


class MOQLState(NamedTuple):
    q_table: jnp.ndarray  # (S, A, d)
    utopian: jnp.ndarray  # (d,) tchebicheff reference state
    env_state: tuple
    obs: jnp.ndarray
    stats: EpisodeStats
    key: jax.Array
    global_step: jnp.ndarray
    # dyna model (dense tabular): counts, mean next-state one-hot argmax, mean reward
    model_count: jnp.ndarray | None = None  # (S, A)
    model_next: jnp.ndarray | None = None  # (S, A) most-recent next state index
    model_reward: jnp.ndarray | None = None  # (S, A, d) running mean reward
    model_term: jnp.ndarray | None = None  # (S, A) running mean termination


class MOQLearning(MOAgentBase):
    """Single-policy scalarized Q-learning for a fixed weight vector."""

    def __init__(
        self,
        env: MOEnv,
        weights: np.ndarray,
        config: MOQLearningConfig = MOQLearningConfig(),
        log: bool = False,
    ):
        super().__init__(env, config, log=log)
        if env.num_states is None:
            raise ValueError("MOQLearning needs an env with discrete state indexing")
        self.cfg = config
        self.w = jnp.asarray(weights, dtype=jnp.float32)
        self.venv = VectorMOEnv(env, config.num_envs)
        self.num_states = int(env.num_states)
        self.num_actions = env.num_actions

    def _scalarize(self, q: jnp.ndarray, utopian: jnp.ndarray) -> jnp.ndarray:
        """Scalarize trailing reward dim of q (any leading shape)."""
        if self.cfg.scalarization == "weighted_sum":
            return weighted_sum(q, self.w)
        return tchebicheff(q, self.w, utopian)

    def init_state(self, key: jax.Array | None = None) -> MOQLState:
        cfg = self.cfg
        key = key if key is not None else jax.random.key(cfg.seed)
        k_env, key = jax.random.split(key)
        env_state, obs = self.venv.reset(k_env)
        S, A, d = self.num_states, self.num_actions, self.reward_dim
        dyna_fields = {}
        if cfg.dyna:
            dyna_fields = dict(
                model_count=jnp.zeros((S, A)),
                model_next=jnp.zeros((S, A), dtype=jnp.int32),
                model_reward=jnp.zeros((S, A, d)),
                model_term=jnp.zeros((S, A)),
            )
        return MOQLState(
            q_table=jnp.zeros((S, A, d)),
            utopian=jnp.full((d,), -jnp.inf),
            env_state=env_state,
            obs=obs,
            stats=EpisodeStats.create(cfg.num_envs, d),
            key=key,
            global_step=jnp.int32(0),
            **dyna_fields,
        )

    def _epsilon(self, global_step):
        # per-env step clock (see envelope._epsilon)
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

    def _td_update(self, q_table, utopian, s_idx, actions, rewards, ns_idx, term):
        """Vectorized scatter TD update over a batch of transitions."""
        cfg = self.cfg
        q_next = q_table[ns_idx]  # (B, A, d)
        a_star = jnp.argmax(self._scalarize(q_next, utopian), axis=-1)  # (B,)
        boot = jnp.take_along_axis(q_next, a_star[:, None, None], axis=1).squeeze(1)
        target = rewards + cfg.gamma * (1.0 - term[:, None]) * boot
        delta = target - q_table[s_idx, actions]
        return q_table.at[s_idx, actions].add(cfg.learning_rate * delta)

    @partial(jax.jit, static_argnums=(0, 2))
    def train_segment(self, state: MOQLState, num_iters: int):
        cfg = self.cfg
        env = self.env

        def body(s: MOQLState, _):
            key, k_eps, k_act, k_step, k_dyna = jax.random.split(s.key, 5)
            s_idx = env.state_index(s.obs)
            eps = self._epsilon(s.global_step)
            q_s = s.q_table[s_idx]  # (N, A, d)
            greedy = jnp.argmax(self._scalarize(q_s, s.utopian), axis=-1)
            rand_a = jax.random.randint(k_act, (cfg.num_envs,), 0, self.num_actions)
            explore = jax.random.uniform(k_eps, (cfg.num_envs,)) < eps
            actions = jnp.where(explore, rand_a, greedy)

            out = self.venv.step(s.env_state, actions, k_step)
            done = out.terminated | out.truncated
            stats, _fin = s.stats.update(out.reward, done, cfg.gamma)
            ns_idx = env.state_index(out.final_obs)
            term = out.terminated.astype(jnp.float32)

            utopian = update_utopian(s.utopian, out.reward) if cfg.scalarization == "tchebicheff" else s.utopian
            q_table = self._td_update(s.q_table, utopian, s_idx, actions, out.reward, ns_idx, term)

            new_s = s._replace(
                q_table=q_table,
                utopian=utopian,
                env_state=out.state,
                obs=out.obs,
                stats=stats,
                key=key,
                global_step=s.global_step + cfg.num_envs,
            )

            if cfg.dyna:
                cnt = s.model_count.at[s_idx, actions].add(1.0)
                mr = s.model_reward.at[s_idx, actions].add(
                    (out.reward - s.model_reward[s_idx, actions]) / cnt[s_idx, actions][:, None]
                )
                mt = s.model_term.at[s_idx, actions].add(
                    (term - s.model_term[s_idx, actions]) / cnt[s_idx, actions]
                )
                mn = s.model_next.at[s_idx, actions].set(ns_idx)
                # planning: sample visited (s,a) pairs proportional to counts
                flat_p = cnt.reshape(-1)
                total = jnp.sum(flat_p)
                u = jax.random.uniform(k_dyna, (cfg.dyna_updates * cfg.num_envs,)) * total
                flat_idx = jnp.clip(jnp.searchsorted(jnp.cumsum(flat_p), u), 0, flat_p.shape[0] - 1)
                ps, pa = flat_idx // self.num_actions, flat_idx % self.num_actions
                q_table = self._td_update(
                    q_table, utopian, ps, pa, mr[ps, pa], mn[ps, pa], mt[ps, pa]
                )
                new_s = new_s._replace(
                    q_table=q_table, model_count=cnt, model_next=mn, model_reward=mr, model_term=mt
                )

            return new_s, None

        state, _ = jax.lax.scan(body, state, None, length=num_iters)
        return state

    # ------------------------------------------------------------------ eval

    def act_eval(self, q_table, utopian, obs, w=None, key=None):
        s_idx = self.env.state_index(obs)
        return jnp.argmax(self._scalarize(q_table[s_idx], utopian), axis=-1)

    @partial(jax.jit, static_argnums=(0, 3))
    def _policy_eval(self, state: MOQLState, key, rep: int = 5):
        act = lambda obs, w, k: self.act_eval(state.q_table, state.utopian, obs)
        return policy_evaluation(self.env, act, self.w, key, rep=rep, gamma=self.cfg.gamma)

    def train(
        self,
        total_timesteps: int,
        eval_freq: int = 10_000,
        state: MOQLState | None = None,
    ) -> MOQLState:
        cfg = self.cfg
        state = state if state is not None else self.init_state()
        iters_total = max(1, total_timesteps // cfg.num_envs)
        seg = max(1, min(eval_freq // cfg.num_envs, iters_total))
        done_iters = 0
        while done_iters < iters_total:
            n = min(seg, iters_total - done_iters)
            state = self.train_segment(state, n)
            done_iters += n
            ret, disc = self._policy_eval(state, jax.random.key(done_iters))
            self.logger.log(
                {
                    "eval/scalarized_return": float(self._scalarize(ret, state.utopian)),
                    "eval/scalarized_discounted_return": float(self._scalarize(disc, state.utopian)),
                },
                int(state.global_step),
            )
            self._last_eval = (np.asarray(ret), np.asarray(disc))
        return state
