"""MORL/D with checkpoint save + restore (counterpart of reference
examples/morld_lunar_lander_restore.py pattern, via uniform orbax state)."""

import numpy as np

from morl_baselines_tpu.agents import MORLD, MORLDConfig
from morl_baselines_tpu.agents.mosac import MOSACConfig
from morl_baselines_tpu.envs import make

if __name__ == "__main__":
    env = make("mo-mountaincarcontinuous-v0")
    agent = MORLD(
        env,
        MORLDConfig(pop_size=4, exchange_every=20_000, sac=MOSACConfig(num_envs=32)),
        log=True,
    )
    states = agent.train(total_timesteps=400_000, ref_point=np.array([-1100.0, -110.0]))
    # uniform orbax checkpoint of every member's full state pytree
    for i, st in enumerate(states):
        agent.save(st, f"/tmp/morld_ckpt/member_{i}")
    restored = agent.load(states[0], "/tmp/morld_ckpt/member_0")
    print("restored global_step:", int(restored.global_step))
