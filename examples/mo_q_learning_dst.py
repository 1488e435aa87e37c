"""Scalarized MO Q-learning on deep-sea-treasure.

Counterpart of reference examples/mo_q_learning_DST.py (single weight,
tabular vector Q-table); here 16 DST copies step under one vmapped scan.
"""

import numpy as np

from morl_baselines_tpu.agents import MOQLearning, MOQLearningConfig
from morl_baselines_tpu.envs import make

if __name__ == "__main__":
    env = make("deep-sea-treasure-v0")
    agent = MOQLearning(
        env,
        weights=np.array([0.4, 0.6]),
        config=MOQLearningConfig(
            gamma=0.9,
            initial_epsilon=0.9,
            final_epsilon=0.1,
            epsilon_decay_steps=100_000,
            num_envs=16,
        ),
        log=True,
    )
    agent.train(total_timesteps=400_000, eval_freq=40_000)
    ret, disc = agent.last_eval
    print("vec return:", ret, "discounted:", disc)
