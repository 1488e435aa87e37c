"""GPI-LS continuous (conditioned TD3) on mo-hopper.

Counterpart of reference examples/gpi_pd_hopper.py — the continuous-action
GPI family on MuJoCo (host-stepped adapter; see envs/mujoco.py).
"""

import numpy as np

from morl_baselines_tpu.agents import GPILSContinuous, GPILSContinuousConfig
from morl_baselines_tpu.envs import make

if __name__ == "__main__":
    env = make("mo-hopper-v5")
    agent = GPILSContinuous(
        env,
        GPILSContinuousConfig(num_envs=8, buffer_size=400_000, learning_starts=2000),
        log=True,
    )
    agent.train(
        total_timesteps=200_000,
        ref_point=np.array([-100.0, -100.0, -100.0]),
        timesteps_per_iter=20_000,
        weight_selection_algo="gpi-ls",
    )
    print("CCS:", agent.ccs)
