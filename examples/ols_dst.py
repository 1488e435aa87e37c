"""Optimistic Linear Support driving GPI-LS on deep-sea-treasure.

Counterpart of reference examples/ols_dst.py — the OLS weight-iteration
outer loop with an exact-LP priority over the growing CCS.
"""

import numpy as np

from morl_baselines_tpu.agents import GPILS, GPILSConfig
from morl_baselines_tpu.envs import make

if __name__ == "__main__":
    env = make("deep-sea-treasure-v0")
    agent = GPILS(
        env,
        GPILSConfig(num_envs=64, buffer_size=100_000, epsilon_decay_steps=30_000),
        log=True,
    )
    agent.train(
        total_timesteps=150_000,
        ref_point=np.array([0.0, -50.0]),
        known_pareto_front=env.pareto_front(0.98),
        timesteps_per_iter=15_000,
        weight_selection_algo="ols",
    )
    print("CCS:", agent.ccs)
