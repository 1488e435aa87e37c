"""MORL/D population on mo-halfcheetah.

Counterpart of reference examples/morld_cheetah.py.
"""

import numpy as np

from morl_baselines_tpu.agents import MORLD, MORLDConfig, MOSACConfig
from morl_baselines_tpu.envs import make

if __name__ == "__main__":
    env = make("mo-halfcheetah-v5")
    agent = MORLD(
        env,
        MORLDConfig(
            pop_size=6,
            exchange_every=10_000,
            shared_buffer=True,
            update_passes=10,
            sac=MOSACConfig(num_envs=4, buffer_size=400_000, learning_starts=2000),
        ),
        log=True,
    )
    agent.train(
        total_timesteps=300_000,
        ref_point=np.array([-100.0, -100.0]),
    )
