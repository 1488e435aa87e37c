"""LCN — Lorenz Conditioned Networks (fair MORL variant of PCN).

TPU-native re-design of reference multi_policy/lcn/lcn.py:26-529 (Michailidis
et al.): PCN where dominance is replaced by (lambda-)Lorenz dominance —
returns are compared through the cumulative sum of their ascending-sorted
objectives (core.pareto.lorenz_vector), biasing the front toward equitable
solutions.  Shares PCN's model/episode machinery (the reference likewise
imports PCN's classes, lcn.py:17-23); only the ranking and command selection
change.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core.pareto import lorenz_vector, non_dominated_mask
from .pcn import PCN, PCNConfig


@dataclass(frozen=True)
class LCNConfig(PCNConfig):
    lorenz_lambda: float = 1.0  # 1 = pure Lorenz dominance; <1 interpolates


class LCN(PCN):
    def __init__(self, env, config: LCNConfig = LCNConfig(), log: bool = False):
        super().__init__(env, config, log=log)
        self._buffer_rank_lambda = config.lorenz_lambda

    def choose_commands(self, buffer, key, n: int):
        """Command selection among LORENZ-non-dominated episodes (reference lcn.py)."""
        cfg = self.cfg
        vals, hors, valid = jax.tree.map(np.asarray, buffer.top_returns(min(int(buffer.size), 20) or 1))
        vals, hors, valid = np.asarray(vals), np.asarray(hors), np.asarray(valid)
        finite = np.isfinite(vals).all(axis=1)
        vals, hors = vals[valid & finite], hors[valid & finite]
        if len(vals) == 0:
            vals = np.zeros((1, self.reward_dim))
            hors = np.ones((1,)) * cfg.max_episode_len
        lz = np.asarray(lorenz_vector(jnp.asarray(vals), cfg.lorenz_lambda))
        nd = np.asarray(non_dominated_mask(jnp.asarray(lz)))
        vals, hors = vals[nd], hors[nd]
        rng = np.random.default_rng(int(jax.random.randint(key, (), 0, 2**30)))
        std = np.nan_to_num(vals.std(axis=0), nan=0.0, posinf=0.0, neginf=0.0)
        cmds = []
        for _ in range(n):
            i = rng.integers(0, len(vals))
            dr = vals[i].copy()
            j = rng.integers(0, self.reward_dim)
            dr[j] += rng.uniform(0, max(std[j], 1e-3)) * cfg.noise_std_scale
            dh = max(hors[i] - 2.0, 1.0)
            cmds.append(np.concatenate([dr, [dh]]))
        return jnp.asarray(np.stack(cmds), dtype=jnp.float32)
