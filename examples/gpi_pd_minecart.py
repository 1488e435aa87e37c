"""GPI-PD (prioritized, optionally model-based) on minecart.

Counterpart of reference examples/gpi_pd_minecart.py. The config mirrors the
r4 canonical operating point (scripts/parity.py gpipd_minecart_nodyna):
envelope-target GTD priorities + per-new-weight priority recompute, 20
gradient updates per env-step with a 5k-step single-update warmup. ``dyna``
defaults OFF here: on minecart, imagined half-batches from a fixed-budget
model fit dilute the rare ore-sale gradient signal and prevent ignition
(results/r4/RESULTS_r4.md); flip ``dyna=True`` to train the ensemble and mix
imagined rollouts like the reference example does.
"""

import numpy as np

from morl_baselines_tpu.agents import GPIPD, GPIPDConfig
from morl_baselines_tpu.envs import make

if __name__ == "__main__":
    env = make("minecart-v0")
    agent = GPIPD(
        env,
        GPIPDConfig(
            num_envs=16,
            buffer_size=200_000,
            gradient_updates=320,  # 20 per env-step at 16 envs (reference g=20)
            full_updates_after=5_000,
            epsilon_decay_steps=3_000,  # per-env-step clock
            target_net_update_freq=12,
            learning_starts=256,
            per=True,
            gpi_pd=True,
            dyna=False,
            dynamics_rollout_starts=25_000,
            dynamics_uncertainty_threshold=1.5,
        ),
        log=True,
    )
    agent.train(
        total_timesteps=150_000,
        ref_point=np.array([0.0, 0.0, -200.0]),
        known_pareto_front=env.pareto_front(0.98),
        timesteps_per_iter=10_000,
        weight_selection_algo="gpi-ls",
    )
    print("CCS:", agent.ccs)
