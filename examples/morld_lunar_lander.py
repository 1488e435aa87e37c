"""MORL/D population on the 4-objective lunar lander.

Counterpart of reference examples/morld_lunar_lander.py (pop_size 6,
shared buffer, PSA weight adaptation, discrete SAC inner policies —
selected automatically for the discrete action space).
"""

import numpy as np

from morl_baselines_tpu.agents import MORLD, MORLDConfig, MOSACConfig
from morl_baselines_tpu.envs import make

if __name__ == "__main__":
    env = make("mo-lunar-lander-v3")
    agent = MORLD(
        env,
        MORLDConfig(
            pop_size=6,
            exchange_every=5000,
            neighborhood_size=1,
            shared_buffer=True,
            update_passes=10,
            weight_adaptation_method="PSA",
            sac=MOSACConfig(
                num_envs=8,
                buffer_size=200_000,
                batch_size=128,
                learning_starts=1000,
                hidden=(256, 256, 256, 256),
            ),
        ),
        log=True,
    )
    agent.train(
        total_timesteps=200_000,
        ref_point=np.array([-101.0, -1001.0, -101.0, -101.0]),
    )
