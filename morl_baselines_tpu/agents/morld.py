"""MORL/D — multi-objective RL based on decomposition (population outer loop).

TPU-native re-design of reference multi_policy/morld/morld.py:37-584 (Felten
et al., 2023): a population of scalarized single-policy learners (here MOSAC
continuous/discrete), one per weight vector from the uniform simplex, trained
round-robin with cooperation:

- shared replay buffer across the population (reference :245-261) — natural
  here: one device buffer pytree passed to each member's train_segment;
- weight (parameter) transfer to higher-id neighbors at the first iteration
  (reference __share :337-366) — a pytree copy;
- PSA weight adaptation (reference __adapt_weights :368-417);
- ParetoArchive of member snapshots (reference :208, pareto.py:149-175).

The population member states are independent pytrees; the inner loops are the
jitted MOSAC segments.  (A fully vmapped population — all members stepping in
one program — is the roadmap optimization; the outer loop here matches the
reference's turn-by-turn semantics.)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import jax
import numpy as np

from ..core.archive import ParetoArchive
from ..core.weights import equally_spaced_weights, random_weights
from ..envs.base import Box, MOEnv
from ..utils.schedules import nearest_neighbors
from .base import MOAgentBase
from .mosac import MOSAC, MOSACConfig, MOSACDiscrete


@dataclass(frozen=True)
class MORLDConfig:
    pop_size: int = 6
    exchange_every: int = 4000
    neighborhood_size: int = 1
    shared_buffer: bool = True
    update_passes: int = 5
    weight_init_method: str = "uniform"  # or "random"
    weight_adaptation_method: str | None = None  # "PSA" or None
    psa_delta: float = 0.1
    sac: MOSACConfig = MOSACConfig(num_envs=8, learning_starts=500)
    seed: int = 0


class MORLD(MOAgentBase):
    def __init__(self, env: MOEnv, config: MORLDConfig = MORLDConfig(), log: bool = False):
        super().__init__(env, config, log=log)
        self.cfg = config
        d = env.reward_dim
        if config.weight_init_method == "uniform":
            ws = equally_spaced_weights(d, config.pop_size)
        else:
            ws = np.asarray(random_weights(jax.random.key(config.seed), d, n=config.pop_size))
        self.weights = [np.asarray(w, dtype=np.float32) for w in ws]
        agent_cls = MOSAC if isinstance(env.action_space, Box) else MOSACDiscrete
        self.population = [
            agent_cls(env, weights=w, config=config.sac) for w in self.weights
        ]
        self.neighborhoods = nearest_neighbors(np.stack(self.weights), config.neighborhood_size)
        self.archive = ParetoArchive()

    def train(
        self,
        total_timesteps: int,
        ref_point: np.ndarray | None = None,
        known_pareto_front: np.ndarray | None = None,
    ):
        cfg = self.cfg
        states = [agent.init_state(jax.random.key(cfg.seed + i)) for i, agent in enumerate(self.population)]
        shared_buffer = self.population[0].make_buffer() if cfg.shared_buffer else None
        buffers = [None if cfg.shared_buffer else a.make_buffer() for a in self.population]

        global_step = 0
        iteration = 0
        candidate = 0
        evals: List[np.ndarray] = [np.zeros(self.reward_dim) for _ in self.population]
        seg_iters = max(1, cfg.exchange_every // cfg.sac.num_envs)

        while global_step < total_timesteps:
            agent, state = self.population[candidate], states[candidate]
            buf = shared_buffer if cfg.shared_buffer else buffers[candidate]
            state, buf = agent.train_segment(state, buf, seg_iters)
            if cfg.shared_buffer:
                shared_buffer = buf
            else:
                buffers[candidate] = buf
            states[candidate] = state
            global_step += seg_iters * cfg.sac.num_envs

            # cooperation: off-policy update passes for the rest on the shared buffer
            if cfg.shared_buffer and cfg.update_passes > 0:
                for j, (other, ostate) in enumerate(zip(self.population, states)):
                    if j == candidate:
                        continue
                    for p in range(cfg.update_passes):
                        k = jax.random.fold_in(ostate.key, p)
                        batch = shared_buffer.sample(k, cfg.sac.batch_size)
                        ostate = other.update_once(ostate, batch, k)
                    states[j] = ostate

            # neighbor parameter transfer at the very first round (reference :337-366)
            if iteration < len(self.population):
                for n in self.neighborhoods[candidate]:
                    if n > candidate:
                        states[n] = states[n]._replace(
                            actor_ts=states[n].actor_ts.replace(params=states[candidate].actor_ts.params),
                            critic_ts=states[n].critic_ts.replace(
                                params=states[candidate].critic_ts.params,
                                target_params=states[candidate].critic_ts.target_params,
                            ),
                        )

            # evaluate all policies, refresh archive (reference :306-335)
            for j, (a, s) in enumerate(zip(self.population, states)):
                ret, disc = jax.tree.map(np.asarray, a.policy_eval(s, jax.random.key(iteration * 97 + j), 3))
                evals[j] = np.asarray(disc)
                self.archive.add((j, jax.device_get(s.actor_ts.params)), evals[j])

            # PSA weight adaptation (reference :368-417)
            if cfg.weight_adaptation_method == "PSA":
                self._adapt_weights_psa(evals)

            # metrics
            if ref_point is not None and len(self.archive):
                from ..evaluation.evaluation import multi_policy_metrics

                ew = equally_spaced_weights(self.reward_dim, 32)
                metrics = multi_policy_metrics(self.archive.front, np.asarray(ref_point), ew, known_pareto_front)
                self.logger.log(metrics, global_step)
                self._last_metrics = metrics

            candidate = (candidate + 1) % len(self.population)
            iteration += 1

        self._states = states
        self._last_front = self.archive.front
        return states

    def _adapt_weights_psa(self, evals: List[np.ndarray]) -> None:
        delta = self.cfg.psa_delta
        for i, agent in enumerate(self.population):
            ev = evals[i]
            closest_eval, closest_d = None, np.inf
            for cand_eval in self.archive.evaluations:
                dist = float(np.sum((ev - cand_eval) ** 2))
                if 0.01 < dist < closest_d:
                    closest_d, closest_eval = dist, cand_eval
            if closest_eval is None:
                continue
            w = self.weights[i].copy()
            for k in range(len(ev)):
                w[k] = w[k] * (1 + delta) if ev[k] >= closest_eval[k] else w[k] / (1 + delta)
            w = w / np.sum(np.abs(w))
            self.weights[i] = w.astype(np.float32)
            agent.set_weights(w)
