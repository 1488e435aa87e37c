"""Batched policy evaluation — the whole eval path is one jitted program.

The reference evaluates with a python while-loop per episode per weight
(reference common/evaluation.py:23-67 ``eval_mo``, :118-145
``policy_evaluation_mo``; SURVEY §3.5 flags it as a hot host loop).  Here the
entire front construction is vmap(weights) x vmap(episodes) x scan(steps) with
done-masking: thousands of evaluation episodes run as one XLA program.

Metric names/semantics match the reference exactly (eval/hypervolume,
eval/eum, eval/cardinality, eval/igd, eval/mul, eval/sparsity — reference
common/evaluation.py:147-200), since these are the comparison interface to
the published curves.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..core import (
    cardinality,
    expected_utility,
    hypervolume,
    igd,
    maximum_utility_loss,
    sparsity,
)
from ..core.pareto import filter_pareto_dominated, non_dominated_mask
from ..envs.base import MOEnv

# act_fn(obs, w, key) -> action
ActFn = Callable[[jnp.ndarray, jnp.ndarray, jax.Array], jnp.ndarray]


def rollout_episode(
    env: MOEnv,
    act_fn: ActFn,
    w: jnp.ndarray,
    key: jax.Array,
    gamma: float,
    max_steps: int | None = None,
):
    """One masked episode; returns (vec_return, disc_vec_return, length).

    Jittable: scans a fixed number of steps, freezing accumulators after done
    (reference eval_mo's while-loop, evaluation.py:42-53).
    """
    max_steps = max_steps or env.max_episode_steps or 1000
    k_reset, k_run = jax.random.split(key)
    state, obs = env.reset(k_reset)

    def body(carry, _):
        state, obs, done, ret, disc, gpow, length, k = carry
        k, ka, ks = jax.random.split(k, 3)
        action = act_fn(obs, w, ka)
        out = env.step(state, action, ks)
        live = ~done
        ret = ret + live * out.reward
        disc = disc + live * gpow * out.reward
        gpow = jnp.where(live.squeeze(), gpow * gamma, gpow)
        length = length + live.squeeze().astype(jnp.int32)
        done2 = done | (out.terminated | out.truncated)[None]
        return (out.state, out.obs, done2, ret, disc, gpow, length, k), None

    d = env.reward_dim
    init = (
        state,
        obs,
        jnp.zeros((1,), dtype=bool),
        jnp.zeros((d,)),
        jnp.zeros((d,)),
        jnp.asarray(1.0),
        jnp.int32(0),
        k_run,
    )
    (_, _, _, ret, disc, _, length, _), _ = jax.lax.scan(body, init, None, length=max_steps)
    return ret, disc, length


def policy_evaluation(
    env: MOEnv,
    act_fn: ActFn,
    w: jnp.ndarray,
    key: jax.Array,
    rep: int = 5,
    gamma: float = 1.0,
    max_steps: int | None = None,
):
    """Average vec/disc returns over ``rep`` episodes (reference evaluation.py:118-145)."""
    keys = jax.random.split(key, rep)
    rets, discs, _ = jax.vmap(lambda k: rollout_episode(env, act_fn, w, k, gamma, max_steps))(keys)
    return jnp.mean(rets, axis=0), jnp.mean(discs, axis=0)


def evaluate_front(
    env: MOEnv,
    act_fn: ActFn,
    weights: jnp.ndarray,
    key: jax.Array,
    rep: int = 5,
    gamma: float = 1.0,
    max_steps: int | None = None,
):
    """Discounted return per eval weight: vmap over (weights x episodes).

    Replaces the reference's ``[policy_evaluation_mo(...) for ew in
    eval_weights]`` host loop (e.g. gpi_pd.py:884-891) with one program.
    Returns (W, d) discounted vector returns.
    """
    keys = jax.random.split(key, weights.shape[0])
    _, discs = jax.vmap(
        lambda w, k: policy_evaluation(env, act_fn, w, k, rep, gamma, max_steps)
    )(weights, keys)
    return discs


def multi_policy_metrics(
    front: np.ndarray,
    ref_point: np.ndarray,
    eval_weights: np.ndarray,
    ref_front: np.ndarray | None = None,
) -> dict:
    """The reference's eval metric bundle (evaluation.py:147-200), host-side.

    ``front`` may contain dominated points; it is pruned first, as the
    reference does (evaluation.py:166).
    """
    front = np.asarray(front, dtype=np.float64)
    pruned = filter_pareto_dominated(front)
    metrics = {
        "eval/hypervolume": float(hypervolume(pruned, ref_point)),
        "eval/eum": float(expected_utility(jnp.asarray(pruned), jnp.asarray(eval_weights))),
        "eval/cardinality": float(len(pruned)),
        "eval/sparsity": float(sparsity(jnp.asarray(pruned))) if len(pruned) > 1 else 0.0,
    }
    if ref_front is not None and len(ref_front):
        metrics["eval/igd"] = float(igd(jnp.asarray(pruned), jnp.asarray(ref_front)))
        metrics["eval/mul"] = float(
            maximum_utility_loss(jnp.asarray(pruned), jnp.asarray(ref_front), jnp.asarray(eval_weights))
        )
    return metrics


def seed_everything(seed: int) -> jax.Array:
    """Seed every host-side RNG and return the root JAX key.

    Reference common/evaluation.py:203-219 seeds python/numpy/torch global
    state.  JAX has no global RNG — device-side randomness flows through the
    returned key — but the host-side outer loops (LinearSupport tie-breaks,
    PGMORL's scipy fits, numpy-based weight init) still read the numpy/python
    global state, so those are seeded here.
    """
    import os
    import random

    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)
    return jax.random.key(seed)


def log_episode_info(
    finished,
    scalarization: Callable,
    weights: np.ndarray | None,
    global_step: int,
    id: int | None = None,
    verbose: bool = False,
    logger=None,
) -> dict:
    """Log completed-episode statistics (reference common/evaluation.py:221-277).

    ``finished`` is the batched ``EpisodeStats`` row-set emitted by
    ``EpisodeStats.update`` (rows with length 0 are not completed episodes and
    are ignored); statistics are averaged over the episodes that finished this
    step — the vectorized analog of the reference's one-env info dict.  Metric
    keys match the reference so curves are comparable.  Returns the metric
    dict; also sends it to ``logger`` (a MetricLogger) when given.
    """
    mask = np.asarray(finished.length) > 0
    if not mask.any():
        return {}
    ret = np.asarray(finished.ret)[mask].mean(axis=0)
    disc = np.asarray(finished.disc_ret)[mask].mean(axis=0)
    length = float(np.asarray(finished.length)[mask].mean())
    if weights is None:
        scal, disc_scal = scalarization(ret), scalarization(disc)
    else:
        scal, disc_scal = scalarization(ret, weights), scalarization(disc, weights)
    idstr = f"_{id}" if id is not None else ""
    metrics = {
        f"charts{idstr}/timesteps_per_episode": length,
        f"metrics{idstr}/scalarized_episode_return": float(scal),
        f"metrics{idstr}/discounted_scalarized_episode_return": float(disc_scal),
    }
    for i in range(ret.shape[0]):
        metrics[f"metrics{idstr}/episode_return_obj_{i}"] = float(ret[i])
        metrics[f"metrics{idstr}/disc_episode_return_obj_{i}"] = float(disc[i])
    if verbose:
        print(
            f"Episode infos (mean over {int(mask.sum())} finished): steps={length:.1f}, "
            f"return={ret}, discounted={disc}, scalarized={float(scal):.4g} "
            f"(disc {float(disc_scal):.4g})"
        )
    if logger is not None:
        logger.log(metrics, global_step)
    return metrics


def device_front_metrics(
    front: jnp.ndarray,
    valid: jnp.ndarray,
    ref_point: jnp.ndarray,
    eval_weights: jnp.ndarray,
) -> dict:
    """Fully on-device metric bundle (2-obj exact HV; EUM/cardinality any d)."""
    from ..core.indicators import hypervolume_2d
    from ..ops.pareto_kernel import non_dominated_mask_auto

    nd = non_dominated_mask_auto(front, valid)
    out = {
        "eval/eum": expected_utility(front, eval_weights, valid=nd),
        "eval/cardinality": cardinality(front, valid),
    }
    if front.shape[-1] == 2:
        out["eval/hypervolume"] = hypervolume_2d(front, ref_point, valid)
    return out
