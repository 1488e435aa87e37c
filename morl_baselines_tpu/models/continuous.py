"""Continuous-control actors/critics, weight-conditioned (SAC/TD3 families).

Counterparts of the reference's continuous policies: MOSAC's squashed
Gaussian actor (reference mosac_continuous_action.py:28-115), CAPQL's
conditioned actor (capql.py:69-140), and GPI-PD-continuous's deterministic
TD3 actor + Q(s, a, w) critics (gpi_pd_continuous_action.py:34-73,
gpi_ls_continuous_action_jax.py:63-107).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .networks import MLP, BatchRenorm

LOG_STD_MIN, LOG_STD_MAX = -5.0, 2.0


class StabilizedQNet(nn.Module):
    """Q(s, a, w) -> R^d with the reference's stability recipe: BatchRenorm
    between layers, WeightNorm-parameterized Dense, leaky-relu, dropout
    (reference gpi_ls_continuous_action_jax.py:83-107 QNetwork).

    ``train=True`` updates the BatchRenorm running statistics (mutable
    ``batch_stats`` collection); eval applies uses the running averages.
    """

    reward_dim: int
    hidden: Sequence[int] = (256, 256)
    dropout_rate: float = 0.01
    momentum: float = 0.99

    @nn.compact
    def __call__(self, obs, action, w=None, train: bool = False, deterministic: bool = True):
        parts = [obs, action] if w is None else [obs, action, w]
        x = jnp.concatenate(parts, axis=-1)
        x = BatchRenorm(use_running_average=not train, momentum=self.momentum)(x)
        for h in self.hidden:
            x = nn.WeightNorm(nn.Dense(h))(x)
            if self.dropout_rate > 0:
                x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
            x = nn.leaky_relu(x)
            x = BatchRenorm(use_running_average=not train, momentum=self.momentum)(x)
        return nn.Dense(self.reward_dim)(x)


class StabilizedActor(nn.Module):
    """mu(s, w) -> a in [-1, 1] with BatchRenorm + WeightNorm + leaky-relu
    (reference gpi_ls_continuous_action_jax.py:56-81 Policy)."""

    action_dim: int
    hidden: Sequence[int] = (256, 256)
    momentum: float = 0.99

    @nn.compact
    def __call__(self, obs, w, train: bool = False):
        x = jnp.concatenate([obs, w], axis=-1)
        x = BatchRenorm(use_running_average=not train, momentum=self.momentum)(x)
        for h in self.hidden:
            x = nn.WeightNorm(nn.Dense(h))(x)
            x = nn.leaky_relu(x)
            x = BatchRenorm(use_running_average=not train, momentum=self.momentum)(x)
        return jnp.tanh(nn.Dense(self.action_dim)(x))


class SquashedGaussianActor(nn.Module):
    """pi(a|s, w): tanh-squashed Gaussian conditioned on the weight vector."""

    action_dim: int
    hidden: Sequence[int] = (256, 256)

    @nn.compact
    def __call__(self, obs, w=None):
        x = obs if w is None else jnp.concatenate([obs, w], axis=-1)
        x = MLP(hidden=self.hidden, final_activation=True)(x)
        mean = nn.Dense(self.action_dim)(x)
        log_std = nn.Dense(self.action_dim)(x)
        log_std = LOG_STD_MIN + 0.5 * (LOG_STD_MAX - LOG_STD_MIN) * (jnp.tanh(log_std) + 1.0)
        return mean, log_std

    @staticmethod
    def sample(mean, log_std, key):
        """Reparameterized tanh-Gaussian sample with log-prob correction."""
        std = jnp.exp(log_std)
        eps = jax.random.normal(key, mean.shape)
        pre = mean + std * eps
        a = jnp.tanh(pre)
        logp = -0.5 * (eps**2 + 2 * log_std + jnp.log(2 * jnp.pi))
        logp = logp - jnp.log(jnp.maximum(1 - a**2, 1e-6))
        return a, jnp.sum(logp, axis=-1)


class DeterministicActor(nn.Module):
    """mu(s, w) -> a in [-1, 1] (TD3-style, reference gpi_pd_continuous_action.py:34-56)."""

    action_dim: int
    hidden: Sequence[int] = (256, 256)

    @nn.compact
    def __call__(self, obs, w):
        x = jnp.concatenate([obs, w], axis=-1)
        x = MLP(hidden=self.hidden, final_activation=True)(x)
        return jnp.tanh(nn.Dense(self.action_dim)(x))


class ContinuousQNet(nn.Module):
    """Vector critic Q(s, a[, w]) -> R^d (reference mosac_continuous_action.py:28-66).

    Weight conditioning (w not None) is used by CAPQL / GPI-PD-continuous;
    MOSAC's per-policy critics omit it (each policy has a fixed weight).
    """

    reward_dim: int
    hidden: Sequence[int] = (256, 256)
    use_layernorm: bool = False

    @nn.compact
    def __call__(self, obs, action, w=None):
        parts = [obs, action] if w is None else [obs, action, w]
        x = jnp.concatenate(parts, axis=-1)
        x = MLP(hidden=self.hidden, final_activation=True, use_layernorm=self.use_layernorm)(x)
        return nn.Dense(self.reward_dim)(x)


class DiscreteSACActor(nn.Module):
    """pi(a|s, w) categorical logits (reference mosac_discrete_action.py:36-90)."""

    num_actions: int
    hidden: Sequence[int] = (256, 256)

    @nn.compact
    def __call__(self, obs, w=None):
        x = obs if w is None else jnp.concatenate([obs, w], axis=-1)
        x = MLP(hidden=self.hidden, final_activation=True)(x)
        return nn.Dense(self.num_actions)(x)


class DiscreteQNet(nn.Module):
    """Q(s, w) -> (A, d) for discrete SAC (reference mosac_discrete_action.py:36-77)."""

    num_actions: int
    reward_dim: int
    hidden: Sequence[int] = (256, 256)

    @nn.compact
    def __call__(self, obs, w=None):
        x = obs if w is None else jnp.concatenate([obs, w], axis=-1)
        x = MLP(hidden=self.hidden, output_dim=self.num_actions * self.reward_dim)(x)
        return x.reshape((*x.shape[:-1], self.num_actions, self.reward_dim))
