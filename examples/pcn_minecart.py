"""Pareto Conditioned Networks on minecart.

Counterpart of reference examples/pcn_minecart.py (desired-return/horizon
conditioned policy, ranked episodic replay).
"""

import numpy as np

from morl_baselines_tpu.agents import PCN, PCNConfig
from morl_baselines_tpu.envs import make

if __name__ == "__main__":
    env = make("minecart-deterministic-v0")
    agent = PCN(
        env,
        PCNConfig(
            gamma=1.0,
            scaling_factor=(1.0, 1.0, 0.1, 0.1),
            max_episode_len=400,
            max_buffer_episodes=128,
            num_envs=8,
            num_model_updates=50,
        ),
        log=True,
    )
    agent.train(
        total_timesteps=400_000,
        ref_point=np.array([0.0, 0.0, -200.0]),
        num_er_episodes=32,
    )
