"""Pareto Q-learning (set-valued tabular) on deep-sea-treasure.

Counterpart of reference examples/pql_dst.py: learns the full Pareto front
of deterministic policies and tracks a chosen return vector.
"""

import numpy as np

from morl_baselines_tpu.agents import PQL, PQLConfig
from morl_baselines_tpu.envs import make

if __name__ == "__main__":
    env = make("deep-sea-treasure-v0")
    agent = PQL(
        env,
        ref_point=np.array([0.0, -50.0]),
        config=PQLConfig(gamma=1.0, initial_epsilon=1.0, final_epsilon=0.2, epsilon_decay_steps=80_000),
        log=True,
    )
    state = agent.train(
        total_timesteps=100_000,
        ref_point=np.array([0.0, -50.0]),
        known_pareto_front=env.pareto_front(1.0),
        eval_freq=10_000,
    )
    start = int(np.asarray(env.state_index(np.zeros(2, dtype=np.float32))))
    front = agent.get_local_pcs(state, start)
    print("front:", front)
    target = front[np.argmax(front[:, 0])]
    tracked = agent.track_policy(state, target)
    print("tracked return:", tracked, "target:", target)
