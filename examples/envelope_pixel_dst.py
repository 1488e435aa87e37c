"""Envelope Q-Learning on the pixel-observation Deep Sea Treasure.

The CNN-path counterpart of the reference's mario setup
(launch_experiment.py:158-180): the device-rendered PixelDST env goes through
the full mario wrapper stack (MOMaxAndSkip(4) -> Resize(84,84) -> Grayscale ->
FrameStack(4) -> TimeLimit(1000), envs/wrappers.py) and the agent's Q-net uses
a NatureCNN trunk (image_shape=(4, 84, 84)) — all inside one jitted
actor-learner, frames rendered and convolved on device.
"""

import numpy as np

from morl_baselines_tpu.agents import Envelope, EnvelopeConfig
from morl_baselines_tpu.envs import make

if __name__ == "__main__":
    env = make("deep-sea-treasure-pixel-stack-v0")
    agent = Envelope(
        env,
        EnvelopeConfig(
            num_envs=64,
            buffer_size=50_000,
            batch_size=64,
            hidden=(256, 256),
            image_shape=(4, 84, 84),
            num_sample_w=4,
            learning_starts=1000,
            epsilon_decay_steps=20_000,
            gamma=0.98,
        ),
        log=True,
    )
    agent.train(
        total_timesteps=200_000,
        ref_point=np.array([0.0, -50.0]),
        eval_freq=10_000,
        num_eval_weights_for_front=32,
    )
    print("final:", agent._last_metrics)
