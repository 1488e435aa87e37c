"""EUPG on fishwood — ESR criterion (counterpart of reference examples/eupg_fishwood.py)."""

from morl_baselines_tpu.agents import EUPG, EUPGConfig
from morl_baselines_tpu.envs import fishwood_utility, make

if __name__ == "__main__":
    env = make("fishwood-v0")
    agent = EUPG(
        env,
        scalarization=fishwood_utility,  # min(fish, wood // 2)
        config=EUPGConfig(num_envs=64, chunk_len=200, learning_rate=1e-3, gamma=0.99),
        log=True,
    )
    agent.train(total_timesteps=2_000_000, eval_freq=100_000)
