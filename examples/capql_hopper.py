"""CAPQL on the device-resident planar hopper.

The reference ships CAPQL without an example (multi_policy/capql/capql.py);
this mirrors its defaults — 2 critics, angle-cone weight sampler, batch 256
— on the pure-JAX hopper.
"""

import numpy as np

from morl_baselines_tpu.agents import CAPQL, CAPQLConfig
from morl_baselines_tpu.envs import make

if __name__ == "__main__":
    env = make("mo-hopper-jx-v5", max_episode_steps=500)
    agent = CAPQL(
        env,
        CAPQLConfig(
            num_envs=32,
            buffer_size=200_000,
            batch_size=256,
            learning_starts=1_000,
            gradient_updates=8,
            gamma=0.99,
        ),
        log=True,
    )
    agent.train(
        total_timesteps=150_000,
        ref_point=np.array([-100.0, -100.0, -100.0]),
        eval_freq=10_000,
        num_eval_weights_for_front=32,
        eval_max_steps=500,
    )
