"""Multi-policy MOQL with an OLS outer loop on deep-sea-treasure.

Counterpart of reference examples/mp_mo_q_learning_DST.py: one tabular
policy per OLS corner weight, Q-table transfer between policies.
"""

import numpy as np

from morl_baselines_tpu.agents import MOQLearningConfig, MPMOQLConfig, MPMOQLearning
from morl_baselines_tpu.envs import make

if __name__ == "__main__":
    env = make("deep-sea-treasure-v0")
    agent = MPMOQLearning(
        env,
        MPMOQLConfig(
            num_timesteps_per_iteration=40_000,
            weight_selection_algo="ols",
            transfer_q_table=True,
            moql=MOQLearningConfig(
                gamma=0.9,
                initial_epsilon=0.9,
                final_epsilon=0.1,
                epsilon_decay_steps=30_000,
                num_envs=16,
            ),
        ),
        log=True,
    )
    agent.train(
        total_timesteps=400_000,
        ref_point=np.array([0.0, -50.0]),
        known_pareto_front=env.pareto_front(0.9),
    )
    print("CCS:", agent.ccs)
