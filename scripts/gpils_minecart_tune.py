"""GPI-LS minecart tuning sweep (VERDICT round-1 weak #1).

Runs a handful of GPI-LS configurations on minecart at the 2.5M-step budget
on the real TPU chip, logging eval curves + final CCS to JSONL under
results/r2/.  Goal: a CCS whose front quality (HV/EUM) matches Envelope's
multi-point front on the same env.

Usage: PYTHONPATH=/root/repo python /root/repo/scripts/gpils_minecart_tune.py [variant ...]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import numpy as np

sys.path.insert(0, "/root/repo")

from morl_baselines_tpu.agents import GPILS, GPILSConfig
from morl_baselines_tpu.envs import make

# Two failure modes found and fixed by earlier sweep rounds (see
# results/r2/gpils_minecart_tune.jsonl):
# 1. epsilon decays on the per-env step clock (global_step//num_envs): the
#    decay budget must fit within total/num_envs per-env steps (a 100k decay
#    at 64 envs/2.5M steps left the agent ~70% random all run: HV 0).
# 2. the replay buffer must be >= total steps, as the reference's minecart
#    config is (buffer 2e5 >= 1.5e5 steps, examples/gpi_pd_minecart.py:28):
#    minecart sales are rare early-exploration events; a ring buffer smaller
#    than the run overwrites them (measured: 3 sale rows in a 100k ring).
VARIANTS = {
    # reference-shaped operating point: match Envelope's updates-per-env-step
    "A": dict(num_envs=64, gradient_updates=8, batch_size=512, final_epsilon=0.2,
              epsilon_decay_steps=15_000, target_net_update_freq=200, max_support=16,
              buffer_size=2_500_000),
    # faster target refresh + PER (prioritizes the rare sale transitions)
    "B": dict(num_envs=64, gradient_updates=8, batch_size=512, final_epsilon=0.2,
              epsilon_decay_steps=15_000, target_net_update_freq=100, max_support=16,
              per=True, buffer_size=2_500_000),
    # lower floor, soft target updates
    "C": dict(num_envs=64, gradient_updates=8, batch_size=512, final_epsilon=0.05,
              epsilon_decay_steps=10_000, tau=0.005, max_support=32,
              buffer_size=2_500_000),
    # more envs, shorter decay, more updates
    "D": dict(num_envs=128, gradient_updates=16, batch_size=512, final_epsilon=0.1,
              epsilon_decay_steps=8_000, target_net_update_freq=200, max_support=16,
              buffer_size=2_500_000),
    # E: update-count matched to the reference operating point (reference
    # examples/gpi_pd_minecart.py trains 150k serial steps x g~10 updates/step
    # = ~1.5M gradient updates at batch 128, per=False for GPI-LS): at 64 envs
    # x 2.5M steps, 32 updates/iteration gives 1.25M updates.  Uniform buffer
    # (the reference GPI-LS has per=gpi_pd=False), target sync every ~320
    # gradient steps (reference 200).
    "E": dict(num_envs=64, gradient_updates=32, batch_size=128, final_epsilon=0.05,
              epsilon_decay_steps=15_000, target_net_update_freq=10, max_support=16,
              per=False, buffer_size=2_500_000),
    # F: reference-shaped budget: 150k TOTAL steps at 4 envs (37.5k serial
    # steps/env, epsilon decays over the same 1/3-of-run fraction as the
    # reference's 50k/150k), 16 updates/iteration = 4 per env-step.
    "F": dict(num_envs=4, gradient_updates=16, batch_size=128, final_epsilon=0.05,
              epsilon_decay_steps=12_000, target_net_update_freq=50, max_support=16,
              per=False, buffer_size=200_000),
}
TOTALS = {"F": 150_000}


def buffer_diagnostic(state, agent) -> dict:
    """Separate exploration failure from propagation failure: how many stored
    transitions actually sold ore (reward in the first two objectives)?"""
    import numpy as np

    buf = state.buffer
    size = int(buf.size) if hasattr(buf, "size") else int(buf.pos)
    rew = np.asarray(buf.data.reward[:size]) if hasattr(buf, "data") else np.asarray(buf.reward[:size])
    sales = int((rew[:, :2].sum(axis=1) > 0).sum())
    return dict(buffer_size=size, sale_rows=sales)


def run(name: str, seed: int = 0, total: int | None = None) -> dict:
    total = total or TOTALS.get(name, 2_500_000)
    env = make("minecart-v0")
    cfg = GPILSConfig(gamma=0.98, learning_starts=2048, seed=seed, **VARIANTS[name])
    agent = GPILS(env, cfg, log=True)
    ref = np.array([0.0, 0.0, -200.0])
    t0 = time.time()
    state = agent.train(
        total_timesteps=total,
        ref_point=ref,
        known_pareto_front=env.pareto_front(0.98),
        timesteps_per_iter=10_000,
        num_eval_weights_for_front=32,
        eval_max_steps=400,
    )
    wall = time.time() - t0
    ccs = [list(map(float, v)) for v in agent.ccs]
    rec = dict(
        variant=name,
        seed=seed,
        wall=round(wall, 1),
        total=total,
        ccs=ccs,
        metrics={k: float(v) for k, v in agent._last_metrics.items()},
        **buffer_diagnostic(state, agent),
    )
    print(json.dumps(rec), flush=True)
    return rec


if __name__ == "__main__":
    names = sys.argv[1:] or list(VARIANTS)
    out = open("/root/repo/results/r3/gpils_minecart_tune.jsonl", "a")
    for name in names:
        try:
            rec = run(name)
            out.write(json.dumps(rec) + "\n")
            out.flush()
        except Exception as e:  # keep the sweep alive across variant failures
            out.write(json.dumps(dict(variant=name, error=repr(e))) + "\n")
            out.flush()
