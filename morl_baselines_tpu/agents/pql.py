"""PQL — Pareto Q-Learning (tabular, set-valued), masked fixed-capacity sets.

TPU-native re-design of reference multi_policy/pareto_q_learning/pql.py:17-354
(Van Moffaert & Nowé, 2014): per (s, a) a SET of non-dominated Q-vectors

    Q_set(s, a) = avg_reward(s, a) + gamma * ND(s')

where ND(s') is the non-dominated union over a' of Q_set(s', a') at the
observed successor (deterministic-env assumption, as the reference's DST
usage).  Action selection scores each action's Q_set by hypervolume (exact
2-D device kernel) or cardinality (reference :122-154).  Policy *tracking*
executes a chosen target vector by following the closest set member
(reference :295-341).

The dynamic python sets become fixed-capacity (S, A, K, d) arrays with valid
masks; set union + Pareto prune is a batched mask op; everything jits.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.indicators import (
    hypervolume_2d,
    hypervolume_3d,
    hypervolume_mc,
    hypervolume_small_exact,
)
from ..core.pareto import non_dominated_mask
from ..envs.base import MOEnv
from ..evaluation.evaluation import multi_policy_metrics
from .base import MOAgentBase


@dataclass(frozen=True)
class PQLConfig:
    gamma: float = 1.0
    initial_epsilon: float = 1.0
    final_epsilon: float = 0.1
    epsilon_decay_steps: int = 10_000
    set_capacity: int = 16  # K vectors per (s, a) set
    action_eval: str = "hypervolume"  # or "pareto_cardinality"
    seed: int = 0


class PQLState(NamedTuple):
    avg_reward: jnp.ndarray  # (S, A, d)
    counts: jnp.ndarray  # (S, A)
    next_state: jnp.ndarray  # (S, A) observed successor
    terminal: jnp.ndarray  # (S, A) observed termination flag
    q_sets: jnp.ndarray  # (S, A, K, d)
    q_valid: jnp.ndarray  # (S, A, K)
    env_state: tuple
    obs: jnp.ndarray
    key: jax.Array
    global_step: jnp.ndarray


class PQL(MOAgentBase):
    def __init__(self, env: MOEnv, ref_point: np.ndarray, config: PQLConfig = PQLConfig(), log: bool = False):
        super().__init__(env, config, log=log)
        if env.num_states is None:
            raise ValueError("PQL needs an env with discrete state indexing")
        self.cfg = config
        self.ref_point = jnp.asarray(ref_point, dtype=jnp.float32)
        self.S = int(env.num_states)
        self.A = env.num_actions

    def init_state(self, key: jax.Array | None = None) -> PQLState:
        cfg = self.cfg
        key = key if key is not None else jax.random.key(cfg.seed)
        ke, key = jax.random.split(key)
        env_state, obs = self.env.reset(ke)
        S, A, K, d = self.S, self.A, cfg.set_capacity, self.reward_dim
        return PQLState(
            avg_reward=jnp.zeros((S, A, d)),
            counts=jnp.zeros((S, A)),
            next_state=jnp.zeros((S, A), dtype=jnp.int32),
            terminal=jnp.zeros((S, A)),
            q_sets=jnp.zeros((S, A, K, d)),
            q_valid=jnp.zeros((S, A, K), dtype=bool),
            env_state=env_state,
            obs=obs,
            key=key,
            global_step=jnp.int32(0),
        )

    # ------------------------------------------------------------- set algebra

    def _nd_of_state(self, q_sets, q_valid, s_idx):
        """ND(s): non-dominated union over actions of Q_set(s, a), top-K kept."""
        K = self.cfg.set_capacity
        vals = q_sets[s_idx].reshape(-1, self.reward_dim)  # (A*K, d)
        valid = q_valid[s_idx].reshape(-1)
        nd = non_dominated_mask(vals, valid, keep_duplicates=False)
        score = nd.astype(jnp.float32) * 1e3 + jnp.where(nd, jnp.sum(vals, -1), -1e9)
        _, top = jax.lax.top_k(score, K)
        return vals[top], nd[top]

    def _q_set_of(self, state: PQLState, s_idx, a):
        """Q_set(s,a) = avg_r + gamma * ND(s'), or the pure reward at terminals."""
        nd_vals, nd_valid = self._nd_of_state(state.q_sets, state.q_valid, state.next_state[s_idx, a])
        r = state.avg_reward[s_idx, a]
        term = state.terminal[s_idx, a]
        seen = state.counts[s_idx, a] > 0
        vals = r[None, :] + self.cfg.gamma * nd_vals * (1.0 - term)
        # if successor has an empty set (or terminal): the singleton {avg_r}
        any_next = jnp.any(nd_valid) & (term < 0.5)
        valid = jnp.where(any_next, nd_valid, jnp.arange(self.cfg.set_capacity) == 0)
        vals = jnp.where(any_next, vals, jnp.zeros_like(vals).at[0].set(r))
        return vals, valid & seen

    # ------------------------------------------------------------- action eval

    def _score_actions(self, state: PQLState, s_idx, key=None):
        """Per-action score of Q_set(s, a) (reference :122-154).

        Hypervolume scoring is EXACT at any d, like the reference's pymoo
        host HV (reference pql.py:122-154): sweep kernels for d<=3,
        inclusion-exclusion over the capacity-bounded Q-set beyond (exact
        for set_capacity <= 16; Monte-Carlo with common random numbers
        across actions only above that)."""

        def score_a(a):
            vals, valid = self._q_set_of(state, s_idx, a)
            if self.cfg.action_eval == "hypervolume":
                if self.reward_dim == 2:
                    return hypervolume_2d(vals, self.ref_point, valid)
                if self.reward_dim == 3:
                    return hypervolume_3d(vals, self.ref_point, valid)
                if vals.shape[0] <= 16:
                    return hypervolume_small_exact(vals, self.ref_point, valid)
                k = key if key is not None else jax.random.key(0)
                return hypervolume_mc(vals, self.ref_point, k, valid, n_samples=2048)
            # cardinality of non-dominated members
            return jnp.sum(non_dominated_mask(vals, valid)).astype(jnp.float32)

        return jnp.stack([score_a(a) for a in range(self.A)])

    # ------------------------------------------------------------ train segment

    @partial(jax.jit, static_argnums=(0, 2))
    def train_segment(self, state: PQLState, num_steps: int):
        cfg = self.cfg
        env = self.env

        def body(s: PQLState, _):
            key, k_eps, k_act, k_step, k_reset, k_hv = jax.random.split(s.key, 6)
            s_idx = env.state_index(s.obs)
            eps = jnp.clip(
                cfg.initial_epsilon
                - (cfg.initial_epsilon - cfg.final_epsilon) * s.global_step / cfg.epsilon_decay_steps,
                cfg.final_epsilon,
                cfg.initial_epsilon,
            )
            scores = self._score_actions(s, s_idx, k_hv)
            greedy = jnp.argmax(scores)
            action = jnp.where(
                jax.random.uniform(k_eps) < eps,
                jax.random.randint(k_act, (), 0, self.A),
                greedy,
            )
            out = env.step(s.env_state, action, k_step)
            ns_idx = env.state_index(out.obs)
            done = out.terminated | out.truncated

            cnt = s.counts[s_idx, action] + 1.0
            avg_r = s.avg_reward.at[s_idx, action].add((out.reward - s.avg_reward[s_idx, action]) / cnt)
            counts = s.counts.at[s_idx, action].set(cnt)
            next_state = s.next_state.at[s_idx, action].set(ns_idx)
            terminal = s.terminal.at[s_idx, action].set(out.terminated.astype(jnp.float32))

            # refresh the cached Q_set(s, a) row from the new statistics
            tmp = s._replace(avg_reward=avg_r, counts=counts, next_state=next_state, terminal=terminal)
            vals, valid = self._q_set_of(tmp, s_idx, action)
            q_sets = s.q_sets.at[s_idx, action].set(vals)
            q_valid = s.q_valid.at[s_idx, action].set(valid)

            # manual reset on done
            rs, robs = env.reset(k_reset)
            env_state = jax.tree.map(lambda a, b: jnp.where(done, a, b), rs, out.state)
            obs = jnp.where(done, robs, out.obs)

            return (
                s._replace(
                    avg_reward=avg_r,
                    counts=counts,
                    next_state=next_state,
                    terminal=terminal,
                    q_sets=q_sets,
                    q_valid=q_valid,
                    env_state=env_state,
                    obs=obs,
                    key=key,
                    global_step=s.global_step + 1,
                ),
                None,
            )

        state, _ = jax.lax.scan(body, state, None, length=num_steps)
        return state

    # ------------------------------------------------------------------ front

    def get_local_pcs(self, state: PQLState, s_idx: int = 0):
        """Pareto coverage set estimate at a state (reference get_local_pcs)."""
        vals, valid = jax.tree.map(np.asarray, self._nd_of_state(state.q_sets, state.q_valid, jnp.int32(s_idx)))
        return vals[valid]

    def track_policy(self, state: PQLState, target: np.ndarray, key=None, max_steps: int = 200):
        """Execute the policy tracking a target vector (reference :295-341)."""
        env = self.env
        key = key if key is not None else jax.random.key(1)
        k0, key = jax.random.split(key)
        est, obs = env.reset(k0)
        total = np.zeros(self.reward_dim)
        target = np.asarray(target, dtype=np.float64).copy()
        for t in range(max_steps):
            s_idx = int(np.asarray(env.state_index(obs)))
            best_a, best_d = 0, np.inf
            best_vec = None
            for a in range(self.A):
                vals, valid = jax.tree.map(np.asarray, self._q_set_of(state, jnp.int32(s_idx), jnp.int32(a)))
                vals = vals[valid]
                if len(vals) == 0:
                    continue
                dists = np.linalg.norm(vals - target, axis=-1)
                i = int(np.argmin(dists))
                if dists[i] < best_d:
                    best_d, best_a, best_vec = float(dists[i]), a, vals[i]
            key, ks = jax.random.split(key)
            out = env.step(est, jnp.int32(best_a), ks)
            r = np.asarray(out.reward)
            total += r
            if bool(out.terminated | out.truncated):
                break
            est, obs = out.state, out.obs
            target = (target - r) / max(self.cfg.gamma, 1e-8)
        return total

    # ------------------------------------------------------------------ train

    def train(
        self,
        total_timesteps: int,
        ref_point: np.ndarray | None = None,
        known_pareto_front: np.ndarray | None = None,
        eval_freq: int = 5000,
        log_every: int | None = None,
        state: PQLState | None = None,
    ):
        state = state if state is not None else self.init_state()
        done_steps = 0
        seg = min(eval_freq, total_timesteps)
        while done_steps < total_timesteps:
            n = min(seg, total_timesteps - done_steps)
            state = self.train_segment(state, n)
            done_steps += n
            # local PCS at the env's start state (reference get_local_pcs at s0)
            _, obs0 = self.env.reset(jax.random.key(self.cfg.seed))
            start_idx = int(np.asarray(self.env.state_index(obs0)))
            front = self.get_local_pcs(state, start_idx)
            if ref_point is not None and len(front):
                from ..core.weights import equally_spaced_weights

                ew = equally_spaced_weights(self.reward_dim, 32)
                metrics = multi_policy_metrics(front, np.asarray(ref_point), ew, known_pareto_front)
                self.logger.log(metrics, int(state.global_step))
                self._last_metrics = metrics
            self._last_front = front
        self._final_state = state
        return state
