"""MPMOQLearning — multi-policy tabular MOQL driven by LinearSupport.

TPU-native re-design of reference
multi_policy/multi_policy_moqlearning/mp_mo_q_learning.py:22-279: an outer
loop that trains one MOQLearning policy per weight selected by
random/OLS/GPI-LS; supports Q-table transfer from the best CCS policy
(reference :240-242) and GPI action selection over all policies' scalarized
Q-tables (reference :125-139).

Q-tables are dense device arrays, so the GPI policy over P policies is one
(P, S, A, d) einsum; evaluation per weight is a jitted rollout.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..core.weights import random_weights
from ..envs.base import MOEnv
from ..evaluation.evaluation import multi_policy_metrics, policy_evaluation
from ..outer.linear_support import LinearSupport
from .base import MOAgentBase
from .moql import MOQLearning, MOQLearningConfig


@dataclass(frozen=True)
class MPMOQLConfig:
    num_timesteps_per_iteration: int = 10_000
    weight_selection_algo: str = "ols"  # "random" | "ols" | "gpi-ls"
    epsilon_ols: float = 1e-5
    transfer_q_table: bool = True
    use_gpi_policy: bool = False
    moql: MOQLearningConfig = MOQLearningConfig()
    seed: int = 0


class MPMOQLearning(MOAgentBase):
    def __init__(self, env: MOEnv, config: MPMOQLConfig = MPMOQLConfig(), log: bool = False):
        super().__init__(env, config, log=log)
        self.cfg = config
        self.policies: List[MOQLearning] = []
        self.states: List = []
        self.policy_weights: List[np.ndarray] = []

    # -- GPI over all trained policies (reference :125-139) -----------------

    def gpi_action(self, q_tables: jnp.ndarray, obs, w):
        """argmax_a max_p w·Q_p(s, a): q_tables (P, S, A, d)."""
        s_idx = self.env.state_index(obs)
        q = q_tables[:, s_idx]  # (P, A, d)
        scal = jnp.einsum("pad,d->pa", q, w)
        return jnp.argmax(jnp.max(scal, axis=0))

    def _eval_weight(self, policy_idx: int, w: np.ndarray, rep: int = 3):
        agent, state = self.policies[policy_idx], self.states[policy_idx]
        act = lambda obs, wv, k: agent.act_eval(state.q_table, state.utopian, obs)
        _, disc = jax.jit(
            lambda key: policy_evaluation(self.env, act, jnp.asarray(w, dtype=jnp.float32), key, rep, self.cfg.moql.gamma)
        )(jax.random.key(policy_idx))
        return np.asarray(disc)

    def _gpi_evaluator(self, weights: np.ndarray) -> np.ndarray:
        """Batched GPI evaluation over corner weights for GPI-LS priorities."""
        q_tables = jnp.stack([s.q_table for s in self.states])
        act = lambda obs, w, k: self.gpi_action(q_tables, obs, w)
        f = jax.jit(
            lambda ws, key: jax.vmap(
                lambda w, k: policy_evaluation(self.env, act, w, k, 2, self.cfg.moql.gamma)[1]
            )(ws, jax.random.split(key, ws.shape[0]))
        )
        return np.asarray(f(jnp.asarray(weights, dtype=jnp.float32), jax.random.key(123)))

    def train(
        self,
        total_timesteps: int,
        ref_point: np.ndarray | None = None,
        known_pareto_front: np.ndarray | None = None,
        num_eval_weights_for_front: int = 32,
    ):
        cfg = self.cfg
        d = self.reward_dim
        linear_support = LinearSupport(num_objectives=d, epsilon=cfg.epsilon_ols)
        max_iters = max(1, total_timesteps // cfg.num_timesteps_per_iteration)
        rng = np.random.default_rng(cfg.seed)

        for it in range(max_iters):
            if cfg.weight_selection_algo == "random":
                w = np.asarray(random_weights(jax.random.key(cfg.seed + it), d))
            elif cfg.weight_selection_algo == "ols":
                w = linear_support.next_weight("ols")
            else:
                w = linear_support.next_weight(
                    "gpi-ls", gpi_evaluator=self._gpi_evaluator if self.states else (lambda ws: np.zeros_like(ws))
                )
            if w is None:
                break

            agent = MOQLearning(self.env, weights=w, config=cfg.moql)
            state = agent.init_state(jax.random.key(cfg.seed * 1000 + it))
            # Q-table transfer from the best CCS policy for w (reference :240-242)
            if cfg.transfer_q_table and linear_support.ccs:
                vals = np.stack(linear_support.ccs) @ np.asarray(w)
                best = int(np.argmax(vals))
                if best < len(self.states):
                    state = state._replace(q_table=self.states[best].q_table)
            iters = max(1, cfg.num_timesteps_per_iteration // cfg.moql.num_envs)
            state = agent.train_segment(state, iters)

            self.policies.append(agent)
            self.states.append(state)
            self.policy_weights.append(np.asarray(w))
            value = self._eval_weight(len(self.policies) - 1, w)
            removed = linear_support.add_solution(value, w)
            # delete policies dropped from the CCS (reference :153-156)
            keep = [i for i in range(len(self.policies)) if i not in removed or i == len(self.policies) - 1]
            if cfg.weight_selection_algo == "ols" and removed and removed != [len(linear_support.ccs)]:
                pass  # reference removes by CCS index bookkeeping; we keep snapshots for the archive

            if ref_point is not None and linear_support.ccs:
                from ..core.weights import equally_spaced_weights

                ew = equally_spaced_weights(d, num_eval_weights_for_front)
                front = np.stack(linear_support.ccs)
                metrics = multi_policy_metrics(front, np.asarray(ref_point), ew, known_pareto_front)
                self.logger.log(metrics, (it + 1) * cfg.num_timesteps_per_iteration)
                self._last_metrics = metrics
                self._last_front = front

        self._linear_support = linear_support
        return self.states
