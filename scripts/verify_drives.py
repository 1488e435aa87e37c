"""Verification drives on forced-CPU (see .claude/skills/verify/SKILL.md).

The image pins JAX_PLATFORMS=axon in the environment and re-asserts it from a
sitecustomize, so plain `JAX_PLATFORMS=cpu python ...` still lands on the TPU
tunnel; the only reliable way to force CPU in an ad-hoc script is
jax.config.update after import (CLAUDE.md).  Run with
XLA_FLAGS=--xla_force_host_platform_device_count=8 for the multichip drive.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/verify_drives.py
"""

from __future__ import annotations

import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def drive1_envelope_dst() -> None:
    from morl_baselines_tpu.agents import Envelope, EnvelopeConfig
    from morl_baselines_tpu.envs import make

    env = make("deep-sea-treasure-v0")
    agent = Envelope(
        env,
        EnvelopeConfig(
            num_envs=16, buffer_size=8192, batch_size=64, hidden=(64, 64),
            learning_starts=500, epsilon_decay_steps=8000, homotopy_decay_steps=8000,
            target_net_update_freq=100, learning_rate=1e-3,
        ),
        log=True,
    )
    agent.train(
        total_timesteps=16000, ref_point=np.array([0.0, -50.0]),
        eval_freq=4000, num_eval_weights_for_front=16, eval_max_steps=60,
    )
    hv = agent._last_metrics["eval/hypervolume"]
    assert hv > 0.0, f"no learning: final HV {hv}"
    print(f"DRIVE1 ok: final eval/hypervolume={hv:.1f}")
    print(agent._last_front)


def drive3_graft_entry() -> None:
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    print("entry ok:", jax.tree.map(lambda x: x.shape, out))
    g.dryrun_multichip(min(8, len(jax.devices())))
    g.scaling_report(ns=(1, 2, 4, 8), envs_per_device=8, iters=4)


if __name__ == "__main__":
    drive1_envelope_dst()
    drive3_graft_entry()
    print("ALL DRIVES OK")
