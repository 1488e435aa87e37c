"""GPI-LS on deep-sea-treasure (counterpart of reference examples/gpi_pd_*.py)."""

import numpy as np

from morl_baselines_tpu.agents import GPILS, GPILSConfig
from morl_baselines_tpu.envs import make

if __name__ == "__main__":
    env = make("deep-sea-treasure-v0")
    agent = GPILS(
        env,
        GPILSConfig(num_envs=128, buffer_size=100_000, gradient_updates=10, epsilon_decay_steps=40_000),
        log=True,
    )
    agent.train(
        total_timesteps=200_000,
        ref_point=np.array([0.0, -50.0]),
        known_pareto_front=env.pareto_front(0.98),
        timesteps_per_iter=10_000,
        weight_selection_algo="gpi-ls",
    )
    print("CCS:", agent.ccs)
