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
    """TrainState with target params (reference gpi_ls_jax.py:131-134).

    ``batch_stats`` carry BatchRenorm running statistics (a separate flax
    variable collection — NOT gradient-trained); ``target_batch_stats`` are
    their polyak-tracked twin for target networks.
    """

    target_params: Any = None
    batch_stats: Any = None
    target_batch_stats: Any = None


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


class BatchRenorm(nn.Module):
    """Batch Renormalization (Ioffe, 2017 — arXiv:1702.03275).

    Our own implementation of the layer the reference's continuous JAX
    critics treat as load-bearing (gpi_ls_continuous_action_jax.py:856-939):
    during a warmup phase it behaves like plain BatchNorm; afterwards batches
    are normalized with batch statistics *corrected toward the running
    statistics* by the clipped, stop-gradient factors r and d, which makes
    long off-policy runs robust to outlier batches.

    Running statistics live in the ``batch_stats`` variable collection
    (mutable during train-mode applies).
    """

    use_running_average: bool | None = None
    momentum: float = 0.99
    epsilon: float = 1e-3
    warmup_steps: int = 100_000
    rmax: float = 3.0
    dmax: float = 5.0

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None):
        ura = nn.merge_param("use_running_average", self.use_running_average, use_running_average)
        feat = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((feat,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((feat,)))
        steps = self.variable("batch_stats", "steps", lambda: jnp.zeros((), jnp.int32))
        if ura:
            y = (x - ra_mean.value) / jnp.sqrt(ra_var.value + self.epsilon)
        else:
            axes = tuple(range(x.ndim - 1))
            b_mean = jnp.mean(x, axes)
            b_var = jnp.var(x, axes)
            b_std = jnp.sqrt(b_var + self.epsilon)
            ra_std = jnp.sqrt(ra_var.value + self.epsilon)
            warm = steps.value > self.warmup_steps
            r = jnp.clip(b_std / ra_std, 1.0 / self.rmax, self.rmax)
            d = jnp.clip((b_mean - ra_mean.value) / ra_std, -self.dmax, self.dmax)
            r = jax.lax.stop_gradient(jnp.where(warm, r, 1.0))
            d = jax.lax.stop_gradient(jnp.where(warm, d, 0.0))
            y = (x - b_mean) / b_std * r + d
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * b_mean
                ra_var.value = m * ra_var.value + (1.0 - m) * b_var
                steps.value = steps.value + 1
        scale = self.param("scale", nn.initializers.ones, (feat,))
        bias = self.param("bias", nn.initializers.zeros, (feat,))
        return y * scale + bias


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
    # compute dtype for the head GEMMs (params stay f32).  The GPI action
    # forward runs this net over (num_envs x support) rows every env step —
    # the hot op of GPI-LS — where bf16 doubles MXU throughput; the Q-values
    # are cast back to f32 before the argmax/TD math.
    dtype: Any = None

    @nn.compact
    def __call__(self, obs, w, deterministic: bool = True):
        h = self.hidden[0]
        sf = MLP(hidden=(h,), final_activation=False, dtype=self.dtype)(obs)
        wf = MLP(hidden=(h,), final_activation=False, dtype=self.dtype)(w)
        x = sf * wf
        x = MLP(
            hidden=self.hidden[1:],
            output_dim=self.num_actions * self.reward_dim,
            dropout_rate=self.dropout_rate,
            use_layernorm=self.use_layernorm,
            dtype=self.dtype,
        )(x, deterministic)
        x = x.astype(jnp.float32)
        return x.reshape((*x.shape[:-1], self.num_actions, self.reward_dim))


class EnvelopeQNet(nn.Module):
    """Q(s, w) -> (A, d) with concat obs||w input (reference envelope.py:33-77).

    ``image_shape=(k, H, W)``: treat the flat obs as k stacked grayscale
    frames and feed them through a NatureCNN trunk before the conditioned MLP
    head — the reference's mario path (launch_experiment.py:158-180 stack +
    NatureCNN networks.py:51-88).  Flat obs keep replay/batch plumbing 1-D;
    the reshape is free under XLA.
    """

    num_actions: int
    reward_dim: int
    hidden: Sequence[int] = (256, 256, 256, 256)
    dtype: Any = None
    image_shape: tuple[int, ...] | None = None
    cnn_features: int = 512

    @nn.compact
    def __call__(self, obs, w):
        if self.image_shape is not None:
            k, h, wd = self.image_shape
            img = obs.reshape((*obs.shape[:-1], k, h, wd))
            img = jnp.moveaxis(img, -3, -1)  # (..., H, W, k): frames as channels
            obs = NatureCNN(features_dim=self.cnn_features)(img)
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
        variable_axes={"params": 0, "batch_stats": 0},
        split_rngs={"params": True, "dropout": True},
        axis_size=num,
    )(**kwargs)
