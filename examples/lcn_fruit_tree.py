"""Lorenz Conditioned Networks on fruit-tree (fair 6-objective front).

Counterpart of reference examples/lcn_fruit_tree.py — PCN ranked under
Lorenz dominance for equitable solutions.
"""

import numpy as np

from morl_baselines_tpu.agents import LCN, LCNConfig
from morl_baselines_tpu.envs import make

if __name__ == "__main__":
    env = make("fruit-tree-v0")
    agent = LCN(
        env,
        LCNConfig(
            gamma=1.0,
            scaling_factor=(0.1,) * 6 + (0.1,),
            max_episode_len=8,
            max_buffer_episodes=128,
            num_envs=16,
            lorenz_lambda=1.0,
        ),
        log=True,
    )
    agent.train(
        total_timesteps=100_000,
        ref_point=np.zeros(6),
        num_er_episodes=64,
    )
