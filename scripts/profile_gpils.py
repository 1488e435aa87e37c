"""GPI-LS minecart bench-point breakdown (VERDICT r4 weak #8 / next-step #8).

Splits the gpils_minecart bench operating point (bench.py:78-105: 4096 envs,
M=16 weight support, 10 DroQ updates of batch 128 per iteration, bf16 act
path) into its three device programs and times each in isolation:

  - act:    the per-step (N x M)-row GPI action forward over the support
  - env:    the vectorized minecart step + replay add
  - update: the 10-update DroQ chain (per iteration)

plus the fused train_segment itself, and the same decomposition for the
envelope_minecart headline point (bench.py:228-250: 32768 envs, 16 updates
of batch 128 per iteration, plain conditioned forward) — the two operating
points differ in BOTH the act cost per row (M=16 GPI max vs plain argmax)
and the updates-per-env-step ratio (1/410 vs 1/2048), so the raw steps/s
ratio is not an apples-to-apples kernel comparison.  Output: JSONL to stdout.

Run on the chip:
  PYTHONPATH=/root/repo python scripts/profile_gpils.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def _median_time(fn, reps: int = 3) -> float:
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def emit(**kw):
    print(json.dumps(kw), flush=True)


def profile_gpils(num_envs=4096, iters=50):
    from morl_baselines_tpu.agents import GPILS, GPILSConfig
    from morl_baselines_tpu.core.weights import equally_spaced_weights
    from morl_baselines_tpu.envs import make

    env = make("minecart-v0")
    cfg = GPILSConfig(
        num_envs=num_envs, buffer_size=max(4 * num_envs, 16384), batch_size=128,
        learning_starts=num_envs, gradient_updates=10, max_support=16, bf16_act=True,
    )
    agent = GPILS(env, cfg)
    state = agent.init_state(jax.random.key(0))
    state = agent.set_weight_support(state, equally_spaced_weights(3, 16))
    # warm the buffer + compile everything once
    state = agent.train_segment(state, 4, True, 16)
    jax.block_until_ready(state.ts.params)

    # full segment
    seg = _median_time(lambda: agent.train_segment(state, iters, True, 16))
    emit(metric="gpils_segment_s_per_iter", value=seg / iters, envs=num_envs,
         steps_per_sec=num_envs * iters / seg)

    # act: the (N x M)-row GPI forward
    act = jax.jit(
        lambda s: agent._gpi_actions(s.ts.params, s.obs, s.task_w, s.support, s.support_size)
    )
    jax.block_until_ready(act(state))
    t_act = _median_time(lambda: act(state))
    emit(metric="gpils_gpi_act_s_per_iter", value=t_act, rows=num_envs * 16)

    # plain (support_size=1) forward for reference: same net, no GPI max
    act1 = jax.jit(
        lambda s: agent._gpi_actions(s.ts.params, s.obs, s.task_w, s.support[:1], jnp.int32(1))
    )
    jax.block_until_ready(act1(state))
    emit(metric="gpils_act_support1_s_per_iter", value=_median_time(lambda: act1(state)),
         rows=num_envs)

    # env: vectorized step only
    step = jax.jit(
        lambda s, k: agent.venv.step(s.env_state, jnp.zeros((num_envs,), jnp.int32), k)
    )
    k = jax.random.key(1)
    jax.block_until_ready(step(state, k))
    emit(metric="gpils_env_step_s_per_iter", value=_median_time(lambda: step(state, k)))

    # update chain: 10 DroQ updates of batch 128 (as one jitted scan)
    @jax.jit
    def updates(s, k):
        def one(carry, kk):
            ts = carry
            k1, k2, k3 = jax.random.split(kk, 3)
            batch = s.buffer.sample(k1, cfg.batch_size)
            widx = jax.random.randint(k2, (cfg.batch_size,), 0, s.support_size)
            w = s.support[widx]
            ts, loss, td = agent._update(ts, batch, w, k3)
            return ts, loss
        ts, losses = jax.lax.scan(one, s.ts, jax.random.split(k, cfg.gradient_updates))
        return losses

    jax.block_until_ready(updates(state, k))
    emit(metric="gpils_update_chain_s_per_iter", value=_median_time(lambda: updates(state, k)),
         updates=cfg.gradient_updates, batch=cfg.batch_size)


def profile_envelope(num_envs=32768, iters=100):
    from morl_baselines_tpu.agents.envelope import Envelope, EnvelopeConfig
    from morl_baselines_tpu.envs import make

    env = make("minecart-v0")
    cfg = EnvelopeConfig(
        num_envs=num_envs, buffer_size=max(4 * num_envs, 65536), batch_size=128,
        learning_starts=num_envs, gradient_updates=16, train_freq=1, num_sample_w=4,
    )
    agent = Envelope(env, cfg)
    state = agent.init_state(jax.random.key(0))
    state = agent.train_segment(state, 4)
    jax.block_until_ready(state.ts.params)
    seg = _median_time(lambda: agent.train_segment(state, iters))
    emit(metric="envelope_segment_s_per_iter", value=seg / iters, envs=num_envs,
         steps_per_sec=num_envs * iters / seg)

    # act: plain conditioned forward + scalarized argmax over N rows
    @jax.jit
    def act(s):
        q = agent.q_net.apply(s.ts.params, s.obs, s.weights)
        return jnp.argmax(jnp.einsum("bd,bad->ba", s.weights, q), axis=-1)

    jax.block_until_ready(act(state))
    emit(metric="envelope_act_s_per_iter", value=_median_time(lambda: act(state)), rows=num_envs)


if __name__ == "__main__":
    small = "--small" in sys.argv  # CPU sanity sizes
    if small:
        jax.config.update("jax_platforms", "cpu")
    emit(note="gpils breakdown", point="bench.py gpils_minecart (4096 envs, M=16, 10 upd/iter)")
    profile_gpils(num_envs=32 if small else 4096, iters=4 if small else 50)
    emit(note="envelope breakdown", point="bench.py envelope_minecart (32768 envs, 16 upd/iter)")
    profile_envelope(num_envs=64 if small else 32768, iters=4 if small else 100)
