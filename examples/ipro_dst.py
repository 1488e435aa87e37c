"""IPRO (n-D referent decomposition) on deep-sea-treasure.

Counterpart of the reference's IPRO entry points (multi_policy/ipro/): the
NL-MOPPO oracle trains each AASF subproblem with per-call lr annealing and
an entropy ramp; the outer loop tracks lower/upper staircases, HVI referent
selection, and the replay mechanism.
"""

from morl_baselines_tpu.agents.ipro import IPRO, IPROConfig
from morl_baselines_tpu.agents.nlmoppo import NLMOPPOConfig
from morl_baselines_tpu.envs import make

if __name__ == "__main__":
    env = make("deep-sea-treasure-v0")
    ipro = IPRO(
        env,
        IPROConfig(
            tolerance=0.05,
            max_iterations=24,
            iter_total_timesteps=150_000,
            offset=1.0,
            ppo=NLMOPPOConfig(
                num_envs=64,
                num_steps=128,
                update_epochs=4,
                num_minibatches=4,
                gamma=0.995,
                ent_coef=0.05,
                ent_coef_start=0.15,
            ),
        ),
        log=True,
    )
    pf = ipro.train()
    print("pareto front:", pf)
    print("coverage:", ipro.coverage, "replay_triggered:", ipro.replay_triggered)
