"""Envelope Q-Learning on minecart (counterpart of reference examples/envelope_minecart.py).

The BASELINE benchmark config: weight-conditioned DQN with the envelope
max-over-weights TD target, thousands of device-resident minecart envs.
"""

import numpy as np

from morl_baselines_tpu.agents import Envelope, EnvelopeConfig
from morl_baselines_tpu.envs import make

if __name__ == "__main__":
    env = make("minecart-v0")
    agent = Envelope(
        env,
        EnvelopeConfig(
            num_envs=512,
            buffer_size=200_000,
            batch_size=128,
            num_sample_w=4,
            gamma=0.98,
            learning_starts=2048,
            epsilon_decay_steps=100_000,
            homotopy_decay_steps=100_000,
            per=True,
        ),
        log=True,
    )
    agent.train(
        total_timesteps=400_000,
        ref_point=np.array([0.0, 0.0, -200.0]),
        known_pareto_front=env.pareto_front(0.98),
        eval_freq=50_000,
    )
