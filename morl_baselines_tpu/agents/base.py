"""Agent base: config contract, checkpointing, logging — host-side shell.

TPU-native counterpart of the reference's MOAgent/MOPolicy contracts
(reference common/morl_algorithm.py:23-337).  The per-step logic of every
algorithm here is a set of pure jitted functions over an explicit state
pytree; this base class only carries the host-side conveniences: config
export (wandb-compatible dict, reference get_config :275-281), uniform orbax
checkpointing of the full state pytree (SURVEY §5 checkpoint design), and the
metric logger.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any

import jax
import numpy as np

from ..envs.base import MOEnv
from ..utils.logging import MetricLogger


class MOAgentBase:
    """Shared shell for all algorithms."""

    def __init__(self, env: MOEnv, config: Any, log: bool = False, experiment_name: str | None = None):
        self.env = env
        self.config = config
        self.reward_dim = env.reward_dim
        self.obs_dim = env.obs_dim
        self.logger = MetricLogger(
            experiment=experiment_name or type(self).__name__,
            enabled=log,
        )

    def get_config(self) -> dict:
        """Flat config dict (reference morl_algorithm.py:275-281)."""
        cfg = dataclasses.asdict(self.config) if dataclasses.is_dataclass(self.config) else dict(self.config)
        cfg["env_id"] = self.env.name
        cfg["algo"] = type(self).__name__
        return cfg

    # -- checkpointing ------------------------------------------------------

    def save(self, state: Any, path: str | Path) -> None:
        """Orbax checkpoint of the full algorithm state pytree.

        Uniform across algorithms (replaces the reference's per-algo ad-hoc
        th.save dicts, e.g. envelope.py:230-261).
        """
        import orbax.checkpoint as ocp

        path = Path(path).absolute()
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, jax.device_get(state), force=True)

    def load(self, template: Any, path: str | Path) -> Any:
        import orbax.checkpoint as ocp

        path = Path(path).absolute()
        ckptr = ocp.PyTreeCheckpointer()
        restored = ckptr.restore(path, item=jax.device_get(template))
        return jax.tree.map(lambda t, r: jax.numpy.asarray(r, dtype=np.asarray(t).dtype), template, restored)
