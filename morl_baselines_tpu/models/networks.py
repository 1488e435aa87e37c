"""Flax network building blocks for MORL — weight-conditioned, ensemble-vmapped.

TPU-native counterpart of reference common/networks.py:10-157 (torch mlp /
NatureCNN / polyak / layer_init) plus the conditioned architectures used by
the algorithms:

- ``MLP``: configurable trunk (dropout + layernorm options, reference :10-48).
- ``NatureCNN``: Atari trunk with /255 normalization (reference :51-88).
- ``WeightConditionedQNet``: psi-network Q(s, w) -> (A, d) via the
  state-feature x weight-feature Hadamard product — the reference's own JAX
  idiom (reference gpi_ls_jax.py:33-93, gpi_pd.py:41-76).
- ``EnvelopeQNet``: concat obs||w trunk (reference envelope.py:33-77).
- ``ensemble(Module, n)``: nn.vmap critic ensembles with unshared params
  (reference gpi_ls_jax.py:96-128).
- ``polyak_update`` via optax.incremental_update; ``huber``; ``TrainState``
  carrying target params (reference gpi_ls_jax.py:131-134).

Everything keeps batch dims large and static so XLA tiles the matmuls on the
MXU; conditioning is fused elementwise work that XLA folds into the GEMMs.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    """TrainState with target params (reference gpi_ls_jax.py:131-134)."""

    target_params: Any = None


def polyak_update(params, target_params, tau: float):
    """Soft target update; tau=1 -> hard copy (reference networks.py:120-139)."""
    return optax.incremental_update(params, target_params, tau)


def huber(x: jnp.ndarray, min_priority: float = 0.01) -> jnp.ndarray:
    """Elementwise huber with the reference's threshold semantics (networks.py:90-100)."""
    ax = jnp.abs(x)
    return jnp.where(ax < min_priority, 0.5 * x**2, min_priority * ax)


_ACTS: dict[str, Callable] = {
    "relu": nn.relu,
    "tanh": nn.tanh,
    "leaky_relu": nn.leaky_relu,
    "gelu": nn.gelu,
}


class MLP(nn.Module):
    """Configurable MLP trunk (reference networks.py:10-48).

    output_dim None -> return last hidden features (for conditioning heads).
    """

    hidden: Sequence[int] = (256, 256)
    output_dim: int | None = None
    activation: str = "relu"
    dropout_rate: float = 0.0
    use_layernorm: bool = False
    final_activation: bool = False
    # compute dtype for the GEMMs (params stay float32); bfloat16 doubles MXU
    # throughput on the big batched act-path forwards
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        act = _ACTS[self.activation]
        for h in self.hidden:
            x = nn.Dense(h, dtype=self.dtype)(x)
            if self.dropout_rate > 0:
                x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
            if self.use_layernorm:
                # norm statistics stay f32 even when the GEMMs run in bf16
                # (flax would otherwise infer bf16 from the input)
                x = nn.LayerNorm(dtype=jnp.float32)(x)
            x = act(x)
        if self.output_dim is not None:
            x = nn.Dense(self.output_dim, dtype=self.dtype)(x)
            if self.final_activation:
                x = act(x)
        return x.astype(jnp.float32) if self.dtype is not None else x


class NatureCNN(nn.Module):
    """DQN-Nature conv trunk with /255 input normalization (reference networks.py:51-88)."""

    features_dim: int = 512

    @nn.compact
    def __call__(self, x):
        x = x.astype(jnp.float32) / 255.0
        x = nn.relu(nn.Conv(32, (8, 8), strides=(4, 4), padding="VALID")(x))
        x = nn.relu(nn.Conv(64, (4, 4), strides=(2, 2), padding="VALID")(x))
        x = nn.relu(nn.Conv(64, (3, 3), strides=(1, 1), padding="VALID")(x))
        x = x.reshape((*x.shape[:-3], -1))
        return nn.relu(nn.Dense(self.features_dim)(x))


class WeightConditionedQNet(nn.Module):
    """Q(s, w) -> (A, d): state-feature x weight-feature product psi-network.

    The flagship conditioned architecture (reference gpi_ls_jax.py:33-93 /
    gpi_pd.py QNet:41-76): separate MLP embeddings of obs and weight are
    multiplied elementwise, then a head MLP emits A*d Q-values.  The Hadamard
    conditioning is elementwise (VPU) and fuses into the surrounding GEMMs.
    """

    num_actions: int
    reward_dim: int
    hidden: Sequence[int] = (256, 256, 256, 256)
    dropout_rate: float = 0.0
    use_layernorm: bool = False

    @nn.compact
    def __call__(self, obs, w, deterministic: bool = True):
        h = self.hidden[0]
        sf = MLP(hidden=(h,), final_activation=False)(obs)
        wf = MLP(hidden=(h,), final_activation=False)(w)
        x = sf * wf
        x = MLP(
            hidden=self.hidden[1:],
            output_dim=self.num_actions * self.reward_dim,
            dropout_rate=self.dropout_rate,
            use_layernorm=self.use_layernorm,
        )(x, deterministic)
        return x.reshape((*x.shape[:-1], self.num_actions, self.reward_dim))


class EnvelopeQNet(nn.Module):
    """Q(s, w) -> (A, d) with concat obs||w input (reference envelope.py:33-77)."""

    num_actions: int
    reward_dim: int
    hidden: Sequence[int] = (256, 256, 256, 256)
    dtype: Any = None

    @nn.compact
    def __call__(self, obs, w):
        x = jnp.concatenate([obs, w], axis=-1)
        x = MLP(hidden=self.hidden, output_dim=self.num_actions * self.reward_dim, dtype=self.dtype)(x)
        return x.reshape((*x.shape[:-1], self.num_actions, self.reward_dim))


def ensemble(module_cls, num: int, **kwargs):
    """N unshared-parameter copies evaluated in one vmapped forward.

    The reference's ``VectorQNetwork`` pattern (gpi_ls_jax.py:96-128): the
    ensemble axis becomes a leading axis of every weight, so the N critics run
    as one batched GEMM on the MXU instead of N sequential calls.
    """
    return nn.vmap(
        module_cls,
        in_axes=None,  # all positional inputs (incl. the deterministic flag) broadcast
        out_axes=0,
        variable_axes={"params": 0},
        split_rngs={"params": True, "dropout": True},
        axis_size=num,
    )(**kwargs)
