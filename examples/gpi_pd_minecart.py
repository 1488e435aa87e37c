"""GPI-PD (model-based, prioritized) on minecart.

Counterpart of reference examples/gpi_pd_minecart.py: GPI-LS plus a
probabilistic dynamics ensemble feeding imagined transitions into updates.
"""

import numpy as np

from morl_baselines_tpu.agents import GPIPD, GPIPDConfig
from morl_baselines_tpu.envs import make

if __name__ == "__main__":
    env = make("minecart-v0")
    agent = GPIPD(
        env,
        GPIPDConfig(
            num_envs=32,
            buffer_size=200_000,
            gradient_updates=10,
            per=True,
            dyna=True,
            dynamics_rollout_starts=2000,
        ),
        log=True,
    )
    agent.train(
        total_timesteps=200_000,
        ref_point=np.array([0.0, 0.0, -200.0]),
        timesteps_per_iter=10_000,
        weight_selection_algo="gpi-ls",
    )
    print("CCS:", agent.ccs)
