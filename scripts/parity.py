"""Parity protocol runner (VERDICT round-1 next-step #1).

Runs the BASELINE configs at reference budgets for multiple seeds on the real
TPU chip, logging the reference-named eval metric curves (eval/hypervolume,
eval/eum, eval/igd, eval/mul, scalarized returns) to JSONL under results/r2/
so the curves + seed bands can be committed and compared against the
openrlbenchmark protocol shapes (reference docs/algos/performances.md:6-23).

Usage:
  PYTHONPATH=/root/repo python scripts/parity.py [config ...] [--seeds 0,1,2]
Configs: moql_dst eupg_fishwood envelope_minecart gpils_dst gpils_minecart
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

# PARITY_SMOKE=1 shrinks budgets ~100x for a CPU API-check run (no learning).
SMOKE = bool(int(os.environ.get("PARITY_SMOKE", "0")))

import numpy as np

sys.path.insert(0, "/root/repo")

# Persistent XLA compilation cache: first compiles of the big scan programs
# cost ~10 min on the chip; relaunches (tuning sweeps, added seeds) hit disk.
try:
    import jax

    if bool(int(os.environ.get("PARITY_CPU", "0"))):  # smoke-test off-chip
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
except Exception:
    pass

from morl_baselines_tpu.utils.logging import MetricLogger

OUT = Path("/tmp/parity_smoke") if SMOKE else Path("/root/repo/results/r5")


def _logger(name: str, seed: int) -> MetricLogger:
    return MetricLogger(
        experiment=f"{name}_s{seed}", jsonl_path=OUT / f"parity_{name}_seed{seed}.jsonl", stdout_every=5
    )


def _hv_trajectory(name: str, seed: int) -> dict:
    """Best-so-far HV across the run's eval snapshots (the reference's CCS
    persists best-per-weight evaluations across iterations; our recomputed
    fronts are point-in-time snapshots, so the max is the comparable datum)."""
    path = OUT / f"parity_{name}_seed{seed}.jsonl"
    try:
        hvs = [
            (r["global_step"], r["eval/hypervolume"])
            for r in map(json.loads, open(path))
            if "eval/hypervolume" in r
        ]
    except FileNotFoundError:
        return {}
    if not hvs:
        return {}
    step_max, hv_max = max(hvs, key=lambda t: t[1])
    # single-eval finals are a lottery on stochastic-eval envs (minecart
    # seeds sustain in-band HV for 4-5 consecutive evals and then throw a
    # 0.0 snapshot); the median of the last three evals is the robust
    # end-of-run statistic (reference curves are read smoothed the same way)
    last3 = sorted(v for _, v in hvs[-3:])
    return dict(
        hv_final=hvs[-1][1],
        hv_final3_median=last3[len(last3) // 2],
        hv_max=hv_max,
        hv_max_step=step_max,
    )


def moql_dst(seed: int):
    """Reference examples/mo_q_learning_DST.py, faithfully: concave map,
    tchebicheff(tau=4), w=(0.3,0.7), agent gamma 0.9 (the reference example
    keeps MOQLearning's default), CONSTANT epsilon 0.1, 100k steps."""
    from morl_baselines_tpu.agents import MOQLearning, MOQLearningConfig
    from morl_baselines_tpu.envs import make

    env = make("deep-sea-treasure-concave-v0")
    agent = MOQLearning(
        env,
        weights=np.array([0.3, 0.7]),
        config=MOQLearningConfig(
            gamma=0.9, initial_epsilon=0.1, final_epsilon=0.1,
            scalarization="tchebicheff", num_envs=16, seed=seed,
        ),
        log=True,
    )
    agent.logger = _logger("moql_dst", seed)
    agent.train(total_timesteps=100_000, eval_freq=5_000)
    # Quality anchor (VERDICT r4 weak #4): the best tchebicheff utility any
    # policy on the KNOWN front can achieve, under the same utopian the
    # agent's scalarizer would converge to (elementwise max step reward +
    # tau 0.5, core/scalarization.py::update_utopian).
    front = np.asarray(env.pareto_front(0.9))
    utopian = np.max(np.asarray(env.pareto_front(1.0)), axis=0) + 0.5
    w = np.array([0.3, 0.7])
    tcheb = lambda p: -float(np.max(w * np.abs(utopian - p)))
    optimal = max(tcheb(p) for p in front)
    ret, disc = agent.last_eval
    achieved = tcheb(np.asarray(disc))
    return dict(
        last_eval=[list(map(float, x)) for x in agent.last_eval],
        optimal_tchebicheff=optimal,
        achieved_tchebicheff=achieved,
        gap_to_optimal=optimal - achieved,
    )


def eupg_fishwood(seed: int):
    """Reference examples/eupg_fishwood.py: 4M steps, ESR utility min(fish, wood//2)."""
    from morl_baselines_tpu.agents import EUPG, EUPGConfig
    from morl_baselines_tpu.envs import fishwood_utility, make

    env = make("fishwood-v0")
    agent = EUPG(
        env,
        scalarization=fishwood_utility,
        config=EUPGConfig(num_envs=64, chunk_len=200, learning_rate=1e-3, gamma=0.99, seed=seed),
        log=True,
    )
    agent.logger = _logger("eupg_fishwood", seed)
    agent.train(total_timesteps=4_000_000, eval_freq=100_000)
    ret, disc = agent.last_eval
    return dict(last_eval=[list(map(float, x)) for x in agent.last_eval],
                esr_utility=float(np.asarray(fishwood_utility(np.asarray(disc)))))


def eupg_fishwood_lr5e4(seed: int):
    """Second-setting EUPG control (VERDICT r4 weak #6): same protocol at
    half the learning rate, to test whether the 1/10 wood-only collapse rate
    is an operating-point artifact or in-family ESR variance."""
    from morl_baselines_tpu.agents import EUPG, EUPGConfig
    from morl_baselines_tpu.envs import fishwood_utility, make

    env = make("fishwood-v0")
    agent = EUPG(
        env,
        scalarization=fishwood_utility,
        config=EUPGConfig(num_envs=64, chunk_len=200, learning_rate=5e-4, gamma=0.99, seed=seed),
        log=True,
    )
    agent.logger = _logger("eupg_fishwood_lr5e4", seed)
    agent.train(total_timesteps=4_000_000, eval_freq=200_000)
    ret, disc = agent.last_eval
    return dict(last_eval=[list(map(float, x)) for x in agent.last_eval],
                esr_utility=float(np.asarray(fishwood_utility(np.asarray(disc)))))


def envelope_minecart(seed: int):
    """BASELINE Envelope/minecart at the round-1 proven operating point
    (64 envs x 8 updates x batch 512), 2.5M env-steps."""
    from morl_baselines_tpu.agents import Envelope, EnvelopeConfig
    from morl_baselines_tpu.envs import make

    env = make("minecart-v0")
    agent = Envelope(
        env,
        EnvelopeConfig(
            # buffer >= total steps: the reference example never overwrites
            # (buffer 2e6 >> 1e5 steps, examples/envelope_minecart.py:26,44);
            # a 200k ring at 2.5M steps evicts the rare early ore sales and
            # seeds that explored late never learn (r2 seed0: HV ~0 all run).
            num_envs=64, buffer_size=2_500_000, batch_size=512, num_sample_w=4,
            gamma=0.98, learning_starts=2048, gradient_updates=8,
            # per-env step clock: 2.5M/64 envs = 39k per-env steps; decay over
            # half the run like the reference (50k of 100k steps)
            epsilon_decay_steps=20_000, homotopy_decay_steps=15_000, per=True, seed=seed,
        ),
        log=True,
    )
    agent.logger = _logger("envelope_minecart", seed)
    agent.train(
        total_timesteps=2_500_000,
        ref_point=np.array([0.0, 0.0, -200.0]),
        known_pareto_front=env.pareto_front(0.98),
        eval_freq=125_000,
        num_eval_weights_for_front=32,
        eval_max_steps=400,
    )
    return dict(metrics={k: float(v) for k, v in agent._last_metrics.items()})


def gpils_dst(seed: int):
    """GPI-LS on DST, 200k steps (round-1 RESULTS operating point)."""
    from morl_baselines_tpu.agents import GPILS, GPILSConfig
    from morl_baselines_tpu.envs import make

    env = make("deep-sea-treasure-v0")
    agent = GPILS(
        env,
        GPILSConfig(num_envs=128, buffer_size=100_000, gradient_updates=10,
                    epsilon_decay_steps=1_200, gamma=0.98, seed=seed),  # 200k/128 envs = 1.5k per-env steps
        log=True,
    )
    agent.logger = _logger("gpils_dst", seed)
    agent.train(
        total_timesteps=200_000,
        ref_point=np.array([0.0, -50.0]),
        known_pareto_front=env.pareto_front(0.98),
        timesteps_per_iter=10_000,
        num_eval_weights_for_front=32,
    )
    return dict(ccs=[list(map(float, v)) for v in agent.ccs],
                metrics={k: float(v) for k, v in agent._last_metrics.items()})


def gpils_minecart(seed: int, variant: dict | None = None):
    """GPI-LS on minecart at 2.5M steps; config from the tuning sweep."""
    from morl_baselines_tpu.agents import GPILS, GPILSConfig
    from morl_baselines_tpu.envs import make

    env = make("minecart-v0")
    # buffer >= total steps: minecart sales are rare exploration events and
    # must never be overwritten (see scripts/gpils_minecart_tune.py)
    v = variant or dict(num_envs=64, gradient_updates=8, batch_size=512, final_epsilon=0.2,
                        epsilon_decay_steps=15_000, target_net_update_freq=100,
                        max_support=16, per=True, buffer_size=2_500_000)
    agent = GPILS(env, GPILSConfig(gamma=0.98, learning_starts=2048, seed=seed, **v), log=True)
    agent.logger = _logger("gpils_minecart", seed)
    agent.train(
        total_timesteps=2_500_000,
        ref_point=np.array([0.0, 0.0, -200.0]),
        known_pareto_front=env.pareto_front(0.98),
        timesteps_per_iter=10_000,
        num_eval_weights_for_front=32,
        eval_max_steps=400,
    )
    return dict(ccs=[list(map(float, v)) for v in agent.ccs],
                metrics={k: float(v) for k, v in agent._last_metrics.items()})


def gpipd_minecart(seed: int, _name: str = "gpipd_minecart", **_overrides):
    """GPI-PD, REFERENCE DEFAULTS (dyna on) with the r5 fit-to-convergence
    dynamics protocol, on minecart at the reference example's exact ratios
    (examples/gpi_pd_minecart.py, 150k steps = 15 x 10k):

    - 20 gradient updates per env-step (reference default g=20) -> 320 per
      16-env iteration, single-update warmup until step 5000 (reference
      update() :419 / dynamics_rollout_starts=5000).
    - model fit = WHOLE buffer to convergence (bootstrap + holdout early
      stopping, reference probabilistic_ensemble.py:196-290) every ~250
      env-steps; dynamics arch [256,256,256] (example :44); 25k-start len-1
      imagined rollouts, uncertainty threshold 1.5, dyna buffer 1e5,
      real_ratio 0.5.
    - eps 1 -> 0.05 over a third of the run (per-env-step clock), target
      sync every ~200 env-steps (12 iters), buffer 2e5 >= steps."""
    from morl_baselines_tpu.agents import GPIPD, GPIPDConfig
    from morl_baselines_tpu.envs import make
    from morl_baselines_tpu.models.dynamics import EnsembleConfig

    env = make("minecart-v0")
    agent = GPIPD(
        env,
        GPIPDConfig(
            num_envs=16, gradient_updates=4 if SMOKE else 320, full_updates_after=5_000,
            batch_size=128, buffer_size=4_096 if SMOKE else 200_000,
            final_epsilon=0.05, epsilon_decay_steps=3_000,
            target_net_update_freq=12, max_support=16, gamma=0.98,
            learning_starts=256, seed=seed,
            per=True, gpi_pd=True, dyna=True,
            dynamics_train_freq=16, dynamics_rollout_freq=16,
            dynamics_rollout_len=1, dynamics_rollout_starts=256 if SMOKE else 25_000,
            dynamics_uncertainty_threshold=1.5,
            dynamics_fit_to_convergence=True,
            dyna_buffer_size=2_048 if SMOKE else 100_000,
            dyna_batch_share=0.5,
            # max_epochs 50 (not the reference's 200): minecart transitions
            # are near-deterministic outside mining, so the holdout keeps
            # improving >1%/epoch for a long time and the patience stop
            # rarely fires — 200-epoch whole-buffer fits every 256 steps are
            # wall-time prohibitive on one chip (~6 min per 10k-step
            # segment by 80k buffer rows).  50 epochs x whole buffer is
            # already 12x the r4 strongmodel ablation's total fit compute.
            ensemble=EnsembleConfig(
                num_members=5, num_elites=2, hidden=(256, 256, 256),
                max_epochs=8 if SMOKE else 50,
            ),
        ),
        log=True,
    )
    if _overrides:
        from dataclasses import replace as _replace

        agent = GPIPD(env, _replace(agent.cfg, **_overrides), log=True)
    agent.logger = _logger(_name, seed)
    agent.train(
        total_timesteps=1_500 if SMOKE else 150_000,
        ref_point=np.array([0.0, 0.0, -200.0]),
        known_pareto_front=env.pareto_front(0.98),
        timesteps_per_iter=500 if SMOKE else 10_000,
        num_eval_weights_for_front=32,
        # minecart mining is stochastic: single-episode fronts oscillate
        # (seed0 r4: HV 5.6 <-> 0.0); reference evaluates 5 episodes/weight
        # (gpi_pd.py train :797)
        num_eval_episodes_for_front=5,
        eval_max_steps=40 if SMOKE else 400,
    )
    return dict(ccs=[list(map(float, v)) for v in agent.ccs],
                metrics={k: float(v) for k, v in agent._last_metrics.items()},
                **_hv_trajectory(_name, seed))


def gpipd_minecart_rw(seed: int):
    """Dyna-on minecart with rare-sale-weighted dynamics NLL (the bounded-
    epoch substitute for the reference's unbounded fit; models/dynamics.py
    fit_converged row_weights).  Sale rows ~0.1% of the buffer get 100x
    loss weight, batch-normalized."""
    return gpipd_minecart(seed, _name="gpipd_minecart_rw", dynamics_fit_positive_weight=99.0)


def gpils_cont_hopper(seed: int):
    """BASELINE config 4: continuous GPI-LS on the device-resident planar
    hopper at the reference example's budget shape (reference
    examples/gpi_pd_hopper.py: 10 x 15k-step iterations, buffer 4e5 >= steps,
    batch 128, 500-step episode cap).  32 envs x 32 updates/iter keeps the
    reference's 1-gradient-update-per-env-step ratio."""
    from morl_baselines_tpu.agents import GPILSContinuous, GPILSContinuousConfig
    from morl_baselines_tpu.envs import make

    env = make("mo-hopper-jx-v5", max_episode_steps=500)
    agent = GPILSContinuous(
        env,
        GPILSContinuousConfig(
            num_envs=32, gradient_updates=32, batch_size=128, buffer_size=400_000,
            learning_starts=1_000, gamma=0.99, seed=seed,
        ),
        log=True,
    )
    agent.logger = _logger("gpils_cont_hopper", seed)
    agent.train(
        total_timesteps=1_500 if SMOKE else 150_000,
        ref_point=np.array([-100.0, -100.0, -100.0]),
        timesteps_per_iter=500 if SMOKE else 15_000,
        num_eval_weights_for_front=32,
        eval_max_steps=50 if SMOKE else 500,
    )
    return dict(ccs=[list(map(float, v)) for v in agent.ccs],
                metrics={k: float(v) for k, v in agent._last_metrics.items()})


def _gpipd_minecart_base(seed: int, name: str, **overrides):
    """Shared runner for the GPI-PD minecart ablations (r4 forgetting
    analysis: sales are discovered ~40-50k then unlearned in every run)."""
    from dataclasses import replace

    from morl_baselines_tpu.agents import GPIPD, GPIPDConfig
    from morl_baselines_tpu.envs import make

    env = make("minecart-v0")
    cfg = GPIPDConfig(
        num_envs=16, gradient_updates=4 if SMOKE else 320, full_updates_after=5_000,
        batch_size=128, buffer_size=4_096 if SMOKE else 200_000,
        final_epsilon=0.05, epsilon_decay_steps=3_000,
        target_net_update_freq=12, max_support=16, gamma=0.98,
        learning_starts=256, seed=seed,
        per=True, gpi_pd=True, dyna=True,
        dynamics_train_freq=16, dynamics_rollout_freq=16,
        dynamics_rollout_len=1, dynamics_rollout_starts=256 if SMOKE else 25_000,
        dynamics_uncertainty_threshold=1.5,
        # the r4 ablations are pinned to the r4 fixed-budget fit; the new
        # reference-protocol convergence fit is the gpipd_minecart default
        dynamics_fit_to_convergence=False,
        dynamics_fit_samples=256 if SMOKE else 16_384,
        dyna_buffer_size=2_048 if SMOKE else 100_000,
        dyna_batch_share=0.5,
    )
    cfg = replace(cfg, **overrides)
    agent = GPIPD(env, cfg, log=True)
    agent.logger = _logger(name, seed)
    agent.train(
        total_timesteps=1_500 if SMOKE else 150_000,
        ref_point=np.array([0.0, 0.0, -200.0]),
        known_pareto_front=env.pareto_front(0.98),
        timesteps_per_iter=500 if SMOKE else 10_000,
        num_eval_weights_for_front=32,
        num_eval_episodes_for_front=5,
        eval_max_steps=40 if SMOKE else 400,
    )
    return dict(ccs=[list(map(float, v)) for v in agent.ccs],
                metrics={k: float(v) for k, v in agent._last_metrics.items()},
                **_hv_trajectory(name, seed))


def gpipd_minecart_nodyna(seed: int):
    """GPI-PD minecart WITHOUT imagined data (dyna=False): envelope-target
    GTD priorities + per-new-weight recompute only.

    Was the canonical operating point in r4 (the prioritization alone
    reproduces the paper's sample-efficiency claim: HV 9.2 by 120k,
    eval/mul = 0.0 from 130k) while dyna-on failed.  Since r5 the
    REFERENCE-DEFAULT dyna-on config (``gpipd_minecart``) works — it took
    fit-to-convergence dynamics, reward-keyed imagined termination, and
    weight/provenance decoupling (results/r5/RESULTS_r5.md) — so this is
    now the cheaper ablation, kept on the 10-seed protocol for the
    dyna-vs-nodyna comparison."""
    return _gpipd_minecart_base(seed, "gpipd_minecart_nodyna", dyna=False)


def gpipd_minecart_strongmodel(seed: int):
    """Ablation B: dyna with a much stronger model fit (the reference fits
    the WHOLE buffer to convergence with holdout early stopping every 250
    steps; our default is 10 epochs on a 16k sample)."""
    from morl_baselines_tpu.models.dynamics import EnsembleConfig

    return _gpipd_minecart_base(
        seed, "gpipd_minecart_strongmodel",
        dynamics_fit_samples=512 if SMOKE else 65_536,
        ensemble=EnsembleConfig(num_members=5, num_elites=2, epochs=4 if SMOKE else 25),
    )


def gpipd_hopper(seed: int):
    """Continuous GPI-PD at the reference example's shape (reference
    examples/gpi_pd_hopper.py: 150k steps = 10 x 15k, buffer 4e5, batch 128,
    len-5 imagined rollouts of 50k starts every 250 steps, uncertainty 2.0,
    dyna real ratio 0.1, min_priority 0.1) on the device-resident planar
    hopper.  32 envs keeps ~1 gradient update per env-step (g=1 in TD3)."""
    from morl_baselines_tpu.agents import GPIPDContinuous, GPIPDContinuousConfig
    from morl_baselines_tpu.envs import make
    from morl_baselines_tpu.models.dynamics import EnsembleConfig

    env = make("mo-hopper-jx-v5", max_episode_steps=500)
    agent = GPIPDContinuous(
        env,
        GPIPDContinuousConfig(
            num_envs=32, gradient_updates=4 if SMOKE else 32, batch_size=128,
            buffer_size=8_192 if SMOKE else 400_000,
            learning_starts=1_000, gamma=0.99, seed=seed,
            per=True, dyna=True, min_priority=0.1,
            dynamics_train_freq=8, dynamics_rollout_freq=8,
            dynamics_rollout_len=5, dynamics_rollout_starts=256 if SMOKE else 8_192,
            dynamics_uncertainty_threshold=2.0,
            # r5: reference whole-buffer fit-to-convergence protocol (seeds
            # 0-2 of r4 ran the fixed-budget fit; r5 reruns all seeds).
            # max_epochs 50: deterministic physics keeps the holdout
            # improving >1%/epoch, so the patience stop rarely fires and
            # 200-epoch whole-buffer fits are wall-time prohibitive (same
            # bound as gpipd_minecart).
            dynamics_fit_to_convergence=not SMOKE,
            dynamics_fit_samples=256 if SMOKE else 8_192,
            dyna_buffer_size=2_048 if SMOKE else 200_000,
            dyna_batch_share=0.9,
            ensemble=EnsembleConfig(num_members=5, num_elites=2, max_epochs=8 if SMOKE else 50),
        ),
        log=True,
    )
    agent.logger = _logger("gpipd_hopper", seed)
    agent.train(
        total_timesteps=1_500 if SMOKE else 150_000,
        ref_point=np.array([-100.0, -100.0, -100.0]),
        timesteps_per_iter=500 if SMOKE else 15_000,
        num_eval_weights_for_front=32,
        # hopper episodes are high-variance under a churning TD3 policy: 3
        # episodes/weight + best-so-far reporting (r4 weak #3 diagnosis: ALL
        # seeds' single-episode HV snapshots swung 2-6x between evals)
        num_eval_episodes_for_front=3,
        eval_max_steps=50 if SMOKE else 500,
    )
    return dict(ccs=[list(map(float, v)) for v in agent.ccs],
                metrics={k: float(v) for k, v in agent._last_metrics.items()},
                **_hv_trajectory("gpipd_hopper", seed))


def gpils_cont_hopper_500k(seed: int):
    """Longer-budget control for the continuous GPI-LS hopper variance
    (VERDICT r3 weak #5 / next-step #9): same operating point as
    gpils_cont_hopper but 500k steps to show the 150k-budget spread
    collapses as TD3 converges."""
    from morl_baselines_tpu.agents import GPILSContinuous, GPILSContinuousConfig
    from morl_baselines_tpu.envs import make

    env = make("mo-hopper-jx-v5", max_episode_steps=500)
    agent = GPILSContinuous(
        env,
        GPILSContinuousConfig(
            num_envs=32, gradient_updates=32, batch_size=128, buffer_size=500_000,
            learning_starts=1_000, gamma=0.99, seed=seed,
        ),
        log=True,
    )
    agent.logger = _logger("gpils_cont_hopper_500k", seed)
    agent.train(
        total_timesteps=5_000 if SMOKE else 500_000,
        ref_point=np.array([-100.0, -100.0, -100.0]),
        timesteps_per_iter=500 if SMOKE else 15_000,
        num_eval_weights_for_front=32,
        eval_max_steps=50 if SMOKE else 500,
    )
    return dict(ccs=[list(map(float, v)) for v in agent.ccs],
                metrics={k: float(v) for k, v in agent._last_metrics.items()})


def ipro_dst(seed: int):
    """IPRO (n-D machinery: HVI referents + replay) on DST: recover the
    convex-reachable treasure front with coverage >= 1 - tolerance
    (VERDICT r3 next-step #6 done-criterion).  Oracle = NLMOPPO on AASF."""
    from morl_baselines_tpu.agents.ipro import IPRO, IPROConfig
    from morl_baselines_tpu.agents.nlmoppo import NLMOPPOConfig
    from morl_baselines_tpu.core.pareto import filter_pareto_dominated
    from morl_baselines_tpu.envs import make

    env = make("deep-sea-treasure-v0")
    ipro = IPRO(
        env,
        IPROConfig(
            # the reference's default oracle budget is 500k steps/iteration
            # (outer_loop.py iter_total_timesteps); 40k collapsed the init
            # extrema onto the nearest treasure (first r4 run) — 150k at 64
            # envs finds the deep treasures
            tolerance=0.05, max_iterations=3 if SMOKE else 24,
            iter_total_timesteps=1_024 if SMOKE else 150_000,
            offset=1.0, seed=seed,
            # deep treasures need ~10+ zero-reward moves.  r5: each oracle
            # call ramps entropy 0.15 -> 0.05 over its first half (escape
            # the warm-started local trap early, exploit while lr is still
            # alive — a full-call 0.2->0.01 ramp left no exploit window and
            # collapsed to the nearest treasure), anneals lr, and returns
            # its best-by-AASF evaluated iterate (r4's constant-entropy
            # oracle collapsed every run to the 2 init extrema)
            ppo=NLMOPPOConfig(num_envs=64, num_steps=128, update_epochs=4,
                              num_minibatches=4, gamma=0.995, ent_coef=0.05,
                              ent_coef_start=0.15, ent_ramp_frac=0.5,
                              anneal_lr=True, track_best=True,
                              seed=seed),
        ),
        log=True,
    )
    ipro.logger = _logger("ipro_dst", seed)
    pf = ipro.train()
    known = np.asarray(filter_pareto_dominated(np.asarray(env.pareto_front(0.99))))
    # distance of each found point to its nearest known-front point
    pf_arr = np.asarray(pf).reshape(-1, 2)
    d2known = [float(np.min(np.linalg.norm(known - p[None], axis=1))) for p in pf_arr]
    return dict(pf=[list(map(float, p)) for p in pf_arr], coverage=float(ipro.coverage),
                error=float(ipro.error), replay_triggered=int(ipro.replay_triggered),
                dist_to_known_front=d2known)


def ipro_dst_fine(seed: int):
    """IPRO/DST at tighter tolerance (0.02) and a larger iteration cap: with
    the GAE-boundary fix the oracle finds deep treasures, so a finer
    decomposition recovers more of the front (runs are ~1-2 min on-chip)."""
    from dataclasses import replace

    from morl_baselines_tpu.agents.ipro import IPRO, IPROConfig
    from morl_baselines_tpu.agents.nlmoppo import NLMOPPOConfig
    from morl_baselines_tpu.core.pareto import filter_pareto_dominated
    from morl_baselines_tpu.envs import make

    env = make("deep-sea-treasure-v0")
    ipro = IPRO(
        env,
        IPROConfig(
            tolerance=0.02, max_iterations=3 if SMOKE else 40,
            iter_total_timesteps=1_024 if SMOKE else 150_000,
            offset=1.0, seed=seed,
            ppo=NLMOPPOConfig(num_envs=64, num_steps=128, update_epochs=4,
                              num_minibatches=4, gamma=0.995, ent_coef=0.05,
                              ent_coef_start=0.15, ent_ramp_frac=0.5,
                              anneal_lr=True, track_best=True,
                              seed=seed),
        ),
        log=True,
    )
    ipro.logger = _logger("ipro_dst_fine", seed)
    pf = ipro.train()
    known = np.asarray(filter_pareto_dominated(np.asarray(env.pareto_front(0.99))))
    pf_arr = np.asarray(pf).reshape(-1, 2)
    d2known = [float(np.min(np.linalg.norm(known - p[None], axis=1))) for p in pf_arr]
    uniq = sorted(set(tuple(round(float(x), 3) for x in p) for p in pf_arr))
    return dict(pf=[list(map(float, p)) for p in pf_arr], pf_unique=len(uniq),
                coverage=float(ipro.coverage),
                error=float(ipro.error), replay_triggered=int(ipro.replay_triggered),
                dist_to_known_front=d2known)


def pgmorl_halfcheetah(seed: int):
    """BASELINE config 5a: PGMORL population on device-resident planar
    halfcheetah, vectorized (all 6 PPO workers in one vmapped program), at the
    reference example's shape (examples/pgmorl_halfcheetah.py: pop 6,
    warmup 80, evolutionary 20, origin (0,-5), 5M steps)."""
    from morl_baselines_tpu.agents import PGMORL, PGMORLConfig
    from morl_baselines_tpu.agents.moppo import MOPPOConfig
    from morl_baselines_tpu.envs import make

    env = make("mo-halfcheetah-jx-v5")
    agent = PGMORL(
        env,
        origin=np.array([0.0, -5.0]),
        config=PGMORLConfig(
            # 64 envs x 8192 steps/iter is the benched device operating point
            # (16.7k steps/s); at the reference's 4x2048 the vectorized evals
            # dominate wall-clock on this chip.  PPO's updates scale with the
            # collected batch, so the updates-per-env-step ratio is preserved.
            pop_size=6, warmup_iterations=2 if SMOKE else 80, evolutionary_iterations=20,
            ppo=MOPPOConfig(num_envs=4 if SMOKE else 64, steps_per_iteration=256 if SMOKE else 8192,
                            gamma=0.995, seed=seed),
            vectorized=True, seed=seed,
        ),
        log=True,
    )
    agent.logger = _logger("pgmorl_halfcheetah", seed)
    agent.train(
        total_timesteps=3_000 if SMOKE else 5_000_000,
        ref_point=np.array([-100.0, -100.0]),
        eval_max_steps=50 if SMOKE else 500,
    )
    return dict(front=[list(map(float, v)) for v in agent.archive.evaluations],
                metrics={k: float(v) for k, v in agent._last_metrics.items()})


def morld_halfcheetah(seed: int):
    """BASELINE config 5b: MORL/D population on planar halfcheetah,
    vectorized, at the reference example's shape (examples/morld_cheetah.py:
    pop 6, exchange_every 5e4, shared buffer, 10 update passes, PSA, 3M
    steps)."""
    from morl_baselines_tpu.agents import MORLD, MORLDConfig, MOSACConfig
    from morl_baselines_tpu.envs import make

    env = make("mo-halfcheetah-jx-v5")
    agent = MORLD(
        env,
        MORLDConfig(
            pop_size=6, exchange_every=512 if SMOKE else 50_000, shared_buffer=True,
            update_passes=2 if SMOKE else 10,
            weight_adaptation_method="PSA", vectorized=True, seed=seed,
            sac=MOSACConfig(num_envs=4 if SMOKE else 32, learning_starts=64 if SMOKE else 2_000,
                            buffer_size=4_096 if SMOKE else 400_000, seed=seed),
        ),
        log=True,
    )
    agent.logger = _logger("morld_halfcheetah", seed)
    agent.train(
        total_timesteps=2_000 if SMOKE else 3_000_000,
        ref_point=np.array([-100.0, -100.0]),
        eval_max_steps=50 if SMOKE else 500,
    )
    return dict(front=[list(map(float, v)) for v in agent.archive.evaluations],
                metrics={k: float(v) for k, v in agent._last_metrics.items()})


def pql_dst(seed: int):
    """Reference examples/pql_dst.py faithfully: PQL on the CONCAVE map,
    gamma 0.99, eps 1 -> 0.2 over 50k (decay outlives the run), ref point
    (0, -25), HV action evaluation — plus the reference test bar
    (test_algos.py:59-65): track a chosen front point and obtain it exactly."""
    from morl_baselines_tpu.agents import PQL, PQLConfig
    from morl_baselines_tpu.envs import make

    env = make("deep-sea-treasure-concave-v0")
    ref = np.array([0.0, -25.0])
    agent = PQL(
        env,
        ref_point=ref,
        config=PQLConfig(gamma=0.99, initial_epsilon=1.0, final_epsilon=0.2,
                         epsilon_decay_steps=50_000, action_eval="hypervolume", seed=seed),
        log=True,
    )
    agent.logger = _logger("pql_dst", seed)
    state = agent.train(
        total_timesteps=1_000 if SMOKE else 100_000,
        ref_point=ref,
        known_pareto_front=env.pareto_front(0.99),
        eval_freq=200 if SMOKE else 5_000,
    )
    start = int(np.asarray(env.state_index(np.zeros(2, dtype=np.float32))))
    front = agent.get_local_pcs(state, start)
    tracked = []
    if len(front):
        target = front[int(np.argmax(np.asarray(front)[:, 0]))]
        got = agent.track_policy(state, target)
        tracked = dict(target=list(map(float, np.asarray(target))),
                       obtained=list(map(float, np.asarray(got))))
    return dict(front=[list(map(float, p)) for p in np.asarray(front)],
                tracking=tracked,
                metrics={k: float(v) for k, v in agent._last_metrics.items()})


def mpmoql_dst(seed: int):
    """Reference examples/mp_mo_q_learning_DST.py shape: one tabular MOQL per
    outer weight on the convex map with OLS weight selection and Q-table
    transfer (the OLS variant recovers the CCS; the reference example's
    random-weights variant needs 3M steps for the same coverage)."""
    from morl_baselines_tpu.agents import MOQLearningConfig, MPMOQLConfig, MPMOQLearning
    from morl_baselines_tpu.envs import make

    env = make("deep-sea-treasure-v0")
    agent = MPMOQLearning(
        env,
        MPMOQLConfig(
            num_timesteps_per_iteration=500 if SMOKE else 40_000,
            weight_selection_algo="ols", transfer_q_table=True,
            moql=MOQLearningConfig(gamma=0.9, initial_epsilon=0.9, final_epsilon=0.1,
                                   epsilon_decay_steps=30_000, num_envs=16, seed=seed),
        ),
        log=True,
    )
    agent.logger = _logger("mpmoql_dst", seed)
    agent.train(
        total_timesteps=2_000 if SMOKE else 400_000,
        ref_point=np.array([0.0, -50.0]),
        known_pareto_front=env.pareto_front(0.9),
    )
    return dict(ccs=[list(map(float, v)) for v in agent.ccs],
                metrics={k: float(v) for k, v in agent._last_metrics.items()})


def pcn_minecart(seed: int):
    """Reference examples/pcn_minecart.py: PCN on minecart-deterministic,
    gamma 1.0, scaling (1, 1, 0.1, 0.1), batch 256 — at the reference
    example's 1e7-step budget (episodes vectorized 8-wide on device)."""
    from dataclasses import replace

    from morl_baselines_tpu.agents import PCN, PCNConfig
    from morl_baselines_tpu.envs import make

    env = make("minecart-deterministic-v0")
    agent = PCN(
        env,
        PCNConfig(gamma=1.0, scaling_factor=(1.0, 1.0, 0.1, 0.1), max_episode_len=400,
                  max_buffer_episodes=128, num_envs=8, num_model_updates=50,
                  batch_size=256, learning_rate=1e-3, seed=seed),
        log=True,
    )
    agent.logger = _logger("pcn_minecart", seed)
    agent.train(
        total_timesteps=8_000 if SMOKE else 10_000_000,
        ref_point=np.array([0.0, 0.0, -200.0]),
        known_pareto_front=env.pareto_front(1.0),
        num_er_episodes=8 if SMOKE else 32,
        eval_freq=None if SMOKE else 100_000,
    )
    return dict(front=[list(map(float, p)) for p in np.asarray(agent._last_front)],
                metrics={k: float(v) for k, v in agent._last_metrics.items()})


def capql_hopper(seed: int):
    """CAPQL on the device-resident planar hopper (no reference example
    exists; reference capql.py defaults: 2 critics, angle-cone weight
    sampler 22.5deg, batch 256, tau 0.005) — 3-seed learning evidence at the
    continuous-flagship budget shape (VERDICT r4 next-step #4)."""
    from morl_baselines_tpu.agents import CAPQL, CAPQLConfig
    from morl_baselines_tpu.envs import make

    env = make("mo-hopper-jx-v5", max_episode_steps=500)
    agent = CAPQL(
        env,
        CAPQLConfig(num_envs=32, buffer_size=200_000, batch_size=256,
                    learning_starts=1_000, gradient_updates=8, gamma=0.99, seed=seed),
        log=True,
    )
    agent.logger = _logger("capql_hopper", seed)
    agent.train(
        total_timesteps=1_500 if SMOKE else 150_000,
        ref_point=np.array([-100.0, -100.0, -100.0]),
        eval_freq=500 if SMOKE else 10_000,
        num_eval_weights_for_front=32,
        eval_max_steps=50 if SMOKE else 500,
    )
    return dict(metrics={k: float(v) for k, v in agent._last_metrics.items()})


def mosac_hopper(seed: int):
    """Standalone continuous MOSAC (reference mosac_continuous_action.py) on
    the planar hopper at a fixed equal weight: single-policy learning
    evidence — the discounted scalarized return curve must rise."""
    from morl_baselines_tpu.agents import MOSAC, MOSACConfig
    from morl_baselines_tpu.envs import make
    from morl_baselines_tpu.utils.logging import MetricLogger

    env = make("mo-hopper-jx-v5", max_episode_steps=500)
    w = np.ones(3) / 3.0
    agent = MOSAC(
        env, weights=w,
        config=MOSACConfig(num_envs=32, buffer_size=200_000, batch_size=256,
                           learning_starts=1_000, gamma=0.99, seed=seed),
        log=True,
    )
    logger = _logger("mosac_hopper", seed)
    import jax as _jax

    state, buffer = agent.init_state(), agent.make_buffer()
    total = 1_500 if SMOKE else 150_000
    seg_steps = 500 if SMOKE else 10_000
    done = 0
    disc = np.zeros(3)
    while done < total:
        iters = max(1, min(seg_steps, total - done) // agent.cfg.num_envs)
        state, buffer = agent.train_segment(state, buffer, iters)
        done += iters * agent.cfg.num_envs
        ret, disc = agent.policy_eval(state, _jax.random.key(done), 5,
                                      max_steps=50 if SMOKE else 500)
        logger.log(
            {
                "eval/vec_return": [float(x) for x in np.asarray(ret)],
                "eval/discounted_vec_return": [float(x) for x in np.asarray(disc)],
                "eval/scalarized_discounted_return": float(np.asarray(disc) @ w),
            },
            done,
        )
    return dict(final_disc_return=[float(x) for x in np.asarray(disc)],
                scalarized=float(np.asarray(disc) @ w))


CONFIGS = dict(
    moql_dst=moql_dst,
    eupg_fishwood=eupg_fishwood,
    eupg_fishwood_lr5e4=eupg_fishwood_lr5e4,
    envelope_minecart=envelope_minecart,
    gpils_dst=gpils_dst,
    gpils_minecart=gpils_minecart,
    gpipd_minecart=gpipd_minecart,
    gpipd_minecart_rw=gpipd_minecart_rw,
    gpipd_minecart_nodyna=gpipd_minecart_nodyna,
    gpipd_minecart_strongmodel=gpipd_minecart_strongmodel,
    gpipd_hopper=gpipd_hopper,
    ipro_dst=ipro_dst,
    ipro_dst_fine=ipro_dst_fine,
    gpils_cont_hopper=gpils_cont_hopper,
    gpils_cont_hopper_500k=gpils_cont_hopper_500k,
    pgmorl_halfcheetah=pgmorl_halfcheetah,
    morld_halfcheetah=morld_halfcheetah,
    pql_dst=pql_dst,
    mpmoql_dst=mpmoql_dst,
    pcn_minecart=pcn_minecart,
    capql_hopper=capql_hopper,
    mosac_hopper=mosac_hopper,
)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    seeds = [0, 1, 2]
    for a in sys.argv[1:]:
        if a.startswith("--seeds"):
            seeds = [int(s) for s in a.split("=", 1)[1].split(",")]
    names = args or list(CONFIGS)
    OUT.mkdir(parents=True, exist_ok=True)
    summary = open(OUT / "parity_summary.jsonl", "a")
    for name in names:
        for seed in seeds:
            t0 = time.time()
            try:
                res = CONFIGS[name](seed)
                rec = dict(config=name, seed=seed, wall=round(time.time() - t0, 1), **res)
            except Exception as e:
                rec = dict(config=name, seed=seed, error=repr(e))
            summary.write(json.dumps(rec) + "\n")
            summary.flush()
            print("DONE", name, seed, flush=True)
