"""A/B the bf16 GPI action forward on the real chip at the bench operating
point (bench.py::bench_gpils_minecart).  The (N x M)-row conditioned forward
is GPI-LS's hot op; bf16 doubles MXU throughput if the op is compute-bound.

Usage: PYTHONPATH=/root/repo python scripts/bench_gpils_ab.py
"""

from __future__ import annotations

import json
import sys
import time

import jax

sys.path.insert(0, "/root/repo")

from morl_baselines_tpu.agents import GPILS, GPILSConfig
from morl_baselines_tpu.core.weights import equally_spaced_weights
from morl_baselines_tpu.envs import make


def run(bf16_act: bool, num_envs: int = 4096, iters: int = 50) -> float:
    env = make("minecart-v0")
    cfg = GPILSConfig(
        num_envs=num_envs,
        buffer_size=max(4 * num_envs, 16384),
        batch_size=128,
        learning_starts=num_envs,
        gradient_updates=10,
        max_support=16,
        bf16_act=bf16_act,
    )
    agent = GPILS(env, cfg)
    state = agent.init_state(jax.random.key(0))
    state = agent.set_weight_support(state, equally_spaced_weights(3, 16))
    fn = lambda s: agent.train_segment(s, iters, True, 16)
    out = fn(state)
    jax.block_until_ready(out.ts.params)
    t0 = time.perf_counter()
    out = fn(state)
    jax.block_until_ready(out.ts.params)
    dt = time.perf_counter() - t0
    return iters * num_envs / dt


if __name__ == "__main__":
    for bf16 in (False, True):
        sps = run(bf16)
        print(json.dumps({"bf16_act": bf16, "sps": round(sps, 1)}), flush=True)
