"""PGMORL on mo-halfcheetah (BASELINE population config).

Uses the host-stepped MuJoCo adapter; for a fully device-resident population
run, use a pure-JAX env (e.g. mo-mountaincarcontinuous-v0).
"""

import numpy as np

from morl_baselines_tpu.agents import PGMORL, PGMORLConfig
from morl_baselines_tpu.agents.moppo import MOPPOConfig
from morl_baselines_tpu.envs import make

if __name__ == "__main__":
    env = make("mo-halfcheetah-v5")
    agent = PGMORL(
        env,
        origin=np.array([0.0, -5.0]),
        config=PGMORLConfig(
            pop_size=6,
            warmup_iterations=10,
            evolutionary_iterations=4,
            ppo=MOPPOConfig(num_envs=8, steps_per_iteration=4096),
        ),
        log=True,
    )
    agent.train(total_timesteps=2_000_000, ref_point=np.array([0.0, -5.0]))
