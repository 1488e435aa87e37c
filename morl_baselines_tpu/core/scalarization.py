"""Scalarization (utility) functions u(r, w) — pure jnp, batched.

Reference: morl_baselines/common/scalarization.py:7-41.  The Tchebicheff
variant in the reference is a stateful closure whose utopian reference point
auto-adapts; under jit we make that state explicit so it can live in a train
state pytree.
"""

from __future__ import annotations

import jax.numpy as jnp


def weighted_sum(reward: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """w·r, broadcasting over leading batch dims (reference scalarization.py:7-17)."""
    return jnp.sum(jnp.asarray(reward) * jnp.asarray(w), axis=-1)


def tchebicheff(
    reward: jnp.ndarray,
    w: jnp.ndarray,
    utopian: jnp.ndarray,
) -> jnp.ndarray:
    """-max_i w_i * |utopian_i - r_i|  (maximization form, scalarization.py:20-41)."""
    return -jnp.max(jnp.asarray(w) * jnp.abs(jnp.asarray(utopian) - jnp.asarray(reward)), axis=-1)


def update_utopian(utopian: jnp.ndarray, reward: jnp.ndarray, tau: float = 0.5) -> jnp.ndarray:
    """Auto-adapting utopian point: element-wise max of seen rewards + tau.

    Explicit-state version of the reference's closure which bumps its internal
    best point whenever a new reward exceeds it (scalarization.py:27-38).
    ``reward`` may be batched; reduces over leading dims.
    """
    r = jnp.asarray(reward)
    r_max = r if r.ndim == 1 else jnp.max(r.reshape(-1, r.shape[-1]), axis=0)
    return jnp.where(r_max > utopian, r_max + tau, utopian)
