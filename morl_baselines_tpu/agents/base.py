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

    # -- public result accessors (the examples/docs user-facing surface) ----

    @property
    def ccs(self) -> list:
        """Convex coverage set value vectors found so far (outer-loop agents)."""
        ls = getattr(self, "_linear_support", None)
        return list(ls.ccs) if ls is not None else []

    @property
    def last_eval(self):
        """(return, discounted_return) of the most recent evaluation, if any."""
        return getattr(self, "_last_eval", None)

    def get_config(self) -> dict:
        """Flat config dict (reference morl_algorithm.py:275-281)."""
        cfg = dataclasses.asdict(self.config) if dataclasses.is_dataclass(self.config) else dict(self.config)
        cfg["env_id"] = self.env.name
        cfg["algo"] = type(self).__name__
        return cfg

    # -- checkpointing ------------------------------------------------------

    @staticmethod
    def _unwrap_keys(tree: Any) -> Any:
        """PRNG key leaves -> raw uint32 data (orbax can't serialize key dtype)."""
        import jax.numpy as jnp

        def f(x):
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jax.dtypes.prng_key):
                return jax.random.key_data(x)
            return x

        return jax.tree.map(f, tree)

    def save(self, state: Any, path: str | Path) -> None:
        """Orbax checkpoint of the full algorithm state pytree.

        Uniform across algorithms (replaces the reference's per-algo ad-hoc
        th.save dicts, e.g. envelope.py:230-261).  PRNG keys are stored as
        their raw key data.
        """
        import orbax.checkpoint as ocp

        path = Path(path).absolute()
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, jax.device_get(self._unwrap_keys(state)), force=True)

    def load(self, template: Any, path: str | Path) -> Any:
        import jax.numpy as jnp
        import orbax.checkpoint as ocp

        path = Path(path).absolute()
        ckptr = ocp.PyTreeCheckpointer()
        restored = ckptr.restore(path, item=jax.device_get(self._unwrap_keys(template)))

        def rewrap(t, r):
            if hasattr(t, "dtype") and jnp.issubdtype(t.dtype, jax.dtypes.prng_key):
                return jax.random.wrap_key_data(jnp.asarray(r, dtype=jnp.uint32))
            return jnp.asarray(r, dtype=np.asarray(t).dtype)

        return jax.tree.map(rewrap, template, restored)
