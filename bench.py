"""Benchmark: device-resident Envelope actor-learner throughput (env-steps/s/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: the BASELINE.json Envelope-on-minecart config — N vectorized
minecart envs stepping on device, interleaved with envelope-target gradient
updates (batch 128, num_sample_w=4) at a fixed 1-update-per-2048-env-steps
ratio, i.e. the full act->step->store->learn loop under one jitted scan.
On accelerator N=32768 with 16 updates per env-iteration (the measured
throughput plateau); on CPU a small config keeps the smoke run fast.

vs_baseline: the PyTorch reference (single host env + per-step host<->device
copies, reference envelope.py:526-569) sustains on the order of 1e3
env-steps/s; we report value / 1000.
"""

from __future__ import annotations

import json
import time

import jax

REFERENCE_SPS = 1000.0


def main() -> None:
    platform = jax.devices()[0].platform
    on_accel = platform not in ("cpu",)
    num_envs = 32768 if on_accel else 64
    grad_updates = 16 if on_accel else 1
    iters = 100 if on_accel else 20

    from morl_baselines_tpu.agents.envelope import Envelope, EnvelopeConfig
    from morl_baselines_tpu.envs import make

    env = make("minecart-v0")
    cfg = EnvelopeConfig(
        num_envs=num_envs,
        buffer_size=max(4 * num_envs, 65536) if on_accel else 4096,
        batch_size=128,
        learning_starts=num_envs,
        gradient_updates=grad_updates,
        train_freq=1,
        num_sample_w=4,
    )
    agent = Envelope(env, cfg)
    state = agent.init_state(jax.random.key(0))

    # warmup/compile with the SAME static segment length as the timed run, so
    # the timed region contains zero compilation
    state = agent.train_segment(state, iters)
    jax.block_until_ready(state.obs)

    t0 = time.perf_counter()
    state = agent.train_segment(state, iters)
    jax.block_until_ready(state.obs)
    dt = time.perf_counter() - t0

    sps = iters * num_envs / dt
    print(
        json.dumps(
            {
                "metric": "envelope_minecart_env_steps_per_sec_per_chip",
                "value": round(sps, 1),
                "unit": "env-steps/s/chip",
                "vs_baseline": round(sps / REFERENCE_SPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
