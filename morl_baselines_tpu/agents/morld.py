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

Two execution modes:

- sequential (reference semantics): members train round-robin, cooperating
  through one shared device buffer — matches morld.py:545-554 turn by turn.
- ``vectorized=True`` (TPU-native): the WHOLE population trains in one jitted
  program — member states/buffers/weights are stacked pytrees and the MOSAC
  segment runs under ``jax.vmap``, so P members × N envs step as one XLA
  computation.  The population axis can be sharded over a ``pop`` device-mesh
  axis (pass ``mesh=`` to ``train``).  Shared-buffer cooperation becomes
  neighbor-batch exchange: each cooperation pass, member j learns from a batch
  sampled out of member (j+shift)'s buffer (a ``jnp.roll`` along the pop axis
  — rides ICI when sharded).  Reference round-robin + one shared buffer is
  inherently sequential; this is the device-parallel re-design of the same
  cooperation idea (SURVEY §2.5 population axis).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec

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
    vectorized: bool = False  # train the whole population under one vmap
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
        mesh=None,
        eval_max_steps: int | None = None,
    ):
        if self.cfg.vectorized:
            return self._train_vectorized(
                total_timesteps, ref_point, known_pareto_front, mesh, eval_max_steps
            )
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
                ret, disc = jax.tree.map(
                    np.asarray,
                    a.policy_eval(s, jax.random.key(iteration * 97 + j), 3, max_steps=eval_max_steps),
                )
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

    def _psa_weight(self, ev: np.ndarray, w: np.ndarray) -> np.ndarray:
        """PSA update for one member's weight given its evaluation (reference :368-417)."""
        delta = self.cfg.psa_delta
        closest_eval, closest_d = None, np.inf
        for cand_eval in self.archive.evaluations:
            dist = float(np.sum((ev - cand_eval) ** 2))
            if 0.01 < dist < closest_d:
                closest_d, closest_eval = dist, cand_eval
        if closest_eval is None:
            return w
        w = w.copy()
        for k in range(len(ev)):
            w[k] = w[k] * (1 + delta) if ev[k] >= closest_eval[k] else w[k] / (1 + delta)
        return (w / np.sum(np.abs(w))).astype(np.float32)

    def _adapt_weights_psa(self, evals: List[np.ndarray]) -> None:
        for i, agent in enumerate(self.population):
            w = self._psa_weight(evals[i], self.weights[i])
            self.weights[i] = w
            agent.set_weights(w)

    # ------------------------------------------------------ vectorized mode

    @partial(jax.jit, static_argnums=(0, 4, 5))
    def _pop_step(self, states, buffers, weights, seg_iters: int, update_passes: int, key):
        """One population round in a single XLA program: vmapped train segments
        + neighbor-batch cooperation passes."""
        agent = self.population[0]
        states, buffers = jax.vmap(lambda s, b, w: agent.train_segment(s, b, seg_iters, w))(
            states, buffers, weights
        )
        pop = weights.shape[0]
        for r in range(update_passes):
            key, k = jax.random.split(key)
            ks = jax.random.split(k, pop)
            batches = jax.vmap(lambda b, kk: b.sample(kk, agent.cfg.batch_size))(buffers, ks)
            # member j learns from member (j+shift)'s experience — the
            # device-parallel analog of the reference's shared buffer
            shift = (r % max(pop - 1, 1)) + 1
            batches = jax.tree.map(lambda x: jnp.roll(x, shift, axis=0), batches)
            ks2 = jax.random.split(jax.random.fold_in(k, 1), pop)
            states = jax.vmap(agent._update)(states, batches, ks2, weights)
        return states, buffers

    @partial(jax.jit, static_argnums=(0, 3, 5))
    def _pop_eval(self, states, key, rep: int, weights, max_steps: int | None = None):
        agent = self.population[0]
        ks = jax.random.split(key, weights.shape[0])
        return jax.vmap(lambda s, kk, w: agent.policy_eval(s, kk, rep, w, max_steps=max_steps))(
            states, ks, weights
        )

    def _train_vectorized(
        self, total_timesteps, ref_point, known_pareto_front, mesh=None, eval_max_steps=None
    ):
        cfg = self.cfg
        pop = cfg.pop_size
        agent = self.population[0]
        key = jax.random.key(cfg.seed)
        key, ki = jax.random.split(key)
        states = jax.vmap(agent.init_state)(jax.random.split(ki, pop))
        buffers = jax.tree.map(lambda x: jnp.repeat(jnp.asarray(x)[None], pop, axis=0), agent.make_buffer())
        weights = jnp.stack([jnp.asarray(w, dtype=jnp.float32) for w in self.weights])
        if mesh is not None:
            shard = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
            states, buffers, weights = jax.device_put((states, buffers, weights), shard)

        # one-shot neighbor parameter transfer source: member j pulls from its
        # lower neighbor (batched analog of reference __share :337-366)
        src = np.arange(pop)
        for j in range(1, pop):
            if (j - 1) in self.neighborhoods[j]:
                src[j] = j - 1

        seg_iters = max(1, cfg.exchange_every // cfg.sac.num_envs)
        passes = cfg.update_passes if cfg.shared_buffer else 0
        global_step, iteration = 0, 0
        while global_step < total_timesteps:
            key, k1, k2 = jax.random.split(key, 3)
            states, buffers = self._pop_step(states, buffers, weights, seg_iters, passes, k1)
            global_step += seg_iters * cfg.sac.num_envs * pop

            if iteration == 0 and cfg.neighborhood_size > 0:
                gather = lambda x: x[np.asarray(src)]
                states = states._replace(
                    actor_ts=states.actor_ts.replace(params=jax.tree.map(gather, states.actor_ts.params)),
                    critic_ts=states.critic_ts.replace(
                        params=jax.tree.map(gather, states.critic_ts.params),
                        target_params=jax.tree.map(gather, states.critic_ts.target_params),
                    ),
                )

            _, discs = self._pop_eval(states, k2, 3, weights, max_steps=eval_max_steps)
            evals = np.asarray(discs)
            host_params = jax.device_get(states.actor_ts.params)
            for j in range(pop):
                self.archive.add((j, jax.tree.map(lambda x: x[j], host_params)), evals[j])

            if cfg.weight_adaptation_method == "PSA":
                new_ws = [self._psa_weight(evals[j], np.asarray(weights[j])) for j in range(pop)]
                self.weights = new_ws
                weights = jnp.stack(new_ws)
                if mesh is not None:
                    weights = jax.device_put(weights, shard)

            if ref_point is not None and len(self.archive):
                from ..evaluation.evaluation import multi_policy_metrics

                ew = equally_spaced_weights(self.reward_dim, 32)
                metrics = multi_policy_metrics(self.archive.front, np.asarray(ref_point), ew, known_pareto_front)
                self.logger.log(metrics, global_step)
                self._last_metrics = metrics
            iteration += 1

        self._pop_states = states
        self._last_front = self.archive.front
        return states
