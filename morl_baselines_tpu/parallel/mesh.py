"""Device mesh + sharding rules — the framework's distributed substrate.

The reference has NO distributed backend at all (SURVEY §2.5: no
NCCL/MPI/torch.distributed anywhere); scaling is a new first-class component
here.  Design (per the scaling-book recipe): pick a mesh, annotate shardings
with NamedSharding/PartitionSpec, let XLA insert the collectives over ICI.

MORL workloads have tiny networks, so the parallel axes that matter are
- ``data``: the vectorized env batch (thousands of envs per chip), and
- ``pop``: population members / weight vectors (MORL/D, PGMORL, ensembles).

Params stay replicated; gradients are reduced by XLA-inserted psum when the
batch axis is sharded.  Metrics/archives all-gather across hosts over DCN.

Replay-buffer placement: the buffer stays REPLICATED.  Every sharded
``add_batch`` therefore implies an all-gather of the per-device transition
slices (N rows x (2*obs_dim + d + 2) floats per step) so each replica holds
the full ring.  At reference scales this is cheap — e.g. minecart at
N=4096 envs is ~4096x19x4B ≈ 300 KB/step over ICI, far below the update
math — and it buys exact single-device-equivalent semantics (every replica
samples identical batches; see tests/test_parallel.py sharded-equivalence
tests).  Sharding buffer ROWS alongside the env axis would cut the gather
but makes PER sampling a cross-device inverse-CDF (priority cumsum spans
devices) and breaks replica-identical batches; revisit only if profiles show
the gather on the critical path.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None,
    axis_names: Sequence[str] = ("data",),
    shape: Sequence[int] | None = None,
) -> Mesh:
    """Build a mesh over the first n devices (default: all).

    With one axis name the mesh is 1-D over ``data``; pass
    axis_names=("pop", "data") and shape=(p, d) for population x env-batch
    meshes.
    """
    devs = jax.devices() if n_devices is None else jax.devices()[:n_devices]
    n = len(devs)
    if shape is None:
        shape = (n,) if len(axis_names) == 1 else None
    if shape is None:
        raise ValueError("shape required for multi-axis meshes")
    arr = np.asarray(devs).reshape(shape)
    return Mesh(arr, axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading dim over ``axis``; everything else replicated."""
    return NamedSharding(mesh, P(axis))


def shard_agent_state(state, mesh: Mesh, batched_fields: set[str], axis: str = "data"):
    """Place a NamedTuple agent state: listed fields batch-sharded, rest replicated.

    Works on one-level NamedTuple states whose fields are pytrees; per-env
    pytrees (env_state, obs, stats, weights) get their leading dim sharded,
    params/opt-state/buffers are replicated (XLA then inserts psum for grads).
    """
    rep = replicated(mesh)
    shd = batch_sharded(mesh, axis)
    out = {}
    for name in state._fields:
        val = getattr(state, name)
        batched = name in batched_fields
        out[name] = jax.tree.map(
            lambda x: jax.device_put(x, shd if (batched and getattr(x, "ndim", 0) >= 1) else rep),
            val,
        )
    return type(state)(**out)
