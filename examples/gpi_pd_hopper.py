"""GPI-PD continuous (model-based conditioned TD3) on the planar mo-hopper.

Counterpart of reference examples/gpi_pd_hopper.py with gpi_pd=True —
probabilistic-ensemble dynamics, imagined actor rollouts, PER.  Uses the
device-resident planar hopper; swap in "mo-hopper-v5" for the host-stepped
MuJoCo adapter.
"""

import numpy as np

from morl_baselines_tpu.agents import GPIPDContinuous, GPIPDContinuousConfig
from morl_baselines_tpu.envs import make

if __name__ == "__main__":
    env = make("mo-hopper-jx-v5", max_episode_steps=500)
    agent = GPIPDContinuous(
        env,
        GPIPDContinuousConfig(
            num_envs=8,
            buffer_size=400_000,
            learning_starts=2000,
            gradient_updates=8,
            per=True,
            dyna=True,
            dynamics_rollout_starts=1000,
            dynamics_rollout_len=5,
            dynamics_train_freq=250,
            dyna_buffer_size=200_000,
        ),
        log=True,
    )
    agent.train(
        total_timesteps=150_000,
        ref_point=np.array([-100.0, -100.0, -100.0]),
        timesteps_per_iter=15_000,
        weight_selection_algo="gpi-ls",
        eval_max_steps=500,
    )
    print("CCS:", agent.ccs)
