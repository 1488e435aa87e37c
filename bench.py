"""Benchmark suite: device-resident actor-learner throughput per BASELINE config.

Prints one JSON line {"metric", "value", "unit", "vs_baseline"} per workload,
covering the five BASELINE.json configs (VERDICT round-1 next-step #4):

  1. GPI-LS / minecart          (discrete flagship, weight-support GPI acting)
  2. GPI-LS-continuous / hopper (pure-JAX planar mo-hopper-jx, TD3 learner)
  3. PGMORL / halfcheetah       (vectorized population: all PPO workers 1 vmap)
  4. MORL/D / halfcheetah       (vectorized population: MOSAC + shared-buffer
                                 cooperation passes under one jit)
  5. Pallas Pareto kernel       (compiled-mode correctness vs the jnp mask on
                                 the chip + tiled-prune throughput)
  6. Envelope / minecart        (headline; printed LAST so single-line parsers
                                 keep reporting it)

Each workload times the FULL train loop (act -> env step -> store -> gradient
updates) under one jitted scan, compile excluded (identical warmup segment).

vs_baseline: the PyTorch reference steps ONE host env per python-loop
iteration with per-step host<->device copies (reference envelope.py:526-569,
gpi_pd.py:734-788, mosac_continuous_action.py:521-572, mo_ppo.py:390-431) and
sustains on the order of 1e3 env-steps/s; we report value / 1000 throughout.
"""

from __future__ import annotations

import json
import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

try:  # persistent XLA compilation cache (reruns skip the big scan compiles)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
except Exception:
    pass

REFERENCE_SPS = 1000.0


def _emit(metric: str, sps: float) -> None:
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(sps, 1),
                "unit": "env-steps/s/chip",
                "vs_baseline": round(sps / REFERENCE_SPS, 2),
            }
        ),
        flush=True,
    )


def _time(fn, *args, reps: int = 3) -> float:
    """Compile+warmup once, then time ``reps`` runs and return the MEDIAN.

    A single timed repetition is not robust to one-off host/tunnel stalls:
    round 3's driver-recorded pgmorl number collapsed 238x (70.2 vs the
    same-code 16.7k) because one hiccup landed inside the only timed segment.
    All repetitions are logged to stderr for the record."""
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    print(f"[bench] repetitions: {[round(t, 4) for t in times]}s", file=sys.stderr, flush=True)
    return float(np.median(times))


def bench_gpils_minecart(on_accel: bool) -> None:
    """GPI-LS on minecart: GPI action selection over a 16-weight support every
    step (the agent's hot op) + 10 DroQ updates per env-iteration."""
    from morl_baselines_tpu.agents import GPILS, GPILSConfig
    from morl_baselines_tpu.core.weights import equally_spaced_weights
    from morl_baselines_tpu.envs import make

    num_envs = 4096 if on_accel else 32
    iters = 50 if on_accel else 4
    env = make("minecart-v0")
    cfg = GPILSConfig(
        num_envs=num_envs,
        buffer_size=max(4 * num_envs, 16384),
        batch_size=128,
        learning_starts=num_envs,
        gradient_updates=10 if on_accel else 1,
        max_support=16,
        # bf16 GEMMs in the action-selection forward only (+29% on the real
        # chip, scripts/bench_gpils_ab.py); TD/update math stays f32 and
        # GPI-LS/DST reaches the same HV 626.4 with it on (results/r3).
        bf16_act=on_accel,
    )
    agent = GPILS(env, cfg)
    state = agent.init_state(jax.random.key(0))
    # realistic mid-run support: a full 16-weight CCS/corner set
    state = agent.set_weight_support(state, equally_spaced_weights(3, 16))
    dt = _time(lambda s: agent.train_segment(s, iters, True, 16), state)
    _emit("gpils_minecart_env_steps_per_sec_per_chip", iters * num_envs / dt)


def bench_gpils_cont_hopper(on_accel: bool) -> None:
    """Continuous GPI-LS (TD3 + BatchRenorm critics) on the pure-JAX planar
    hopper (envs/planar.py) — the BASELINE config that was host-bound in r1."""
    from morl_baselines_tpu.agents import GPILSContinuous, GPILSContinuousConfig
    from morl_baselines_tpu.core.weights import equally_spaced_weights
    from morl_baselines_tpu.envs import make

    num_envs = 2048 if on_accel else 16
    iters = 50 if on_accel else 2
    env = make("mo-hopper-jx-v5")
    cfg = GPILSContinuousConfig(
        num_envs=num_envs,
        buffer_size=max(4 * num_envs, 16384),
        learning_starts=num_envs,
        gradient_updates=1,
    )
    agent = GPILSContinuous(env, cfg)
    state = agent.init_state(jax.random.key(0))
    state = agent.set_weight_support(state, equally_spaced_weights(env.reward_dim, 8))
    dt = _time(lambda s: agent.train_segment(s, iters), state)
    _emit("gpils_cont_hopper_env_steps_per_sec_per_chip", iters * num_envs / dt)


def bench_pgmorl_halfcheetah(on_accel: bool) -> None:
    """PGMORL vectorized population: all 6 PPO workers (rollout + epochs) in
    ONE vmapped program on planar mo-halfcheetah-jx."""
    from morl_baselines_tpu.agents.moppo import MOPPOConfig
    from morl_baselines_tpu.agents.pgmorl import PGMORL, PGMORLConfig
    from morl_baselines_tpu.envs import make

    pop = 6
    spi = 8192 if on_accel else 256
    env = make("mo-halfcheetah-jx-v5")
    cfg = PGMORLConfig(
        pop_size=pop,
        ppo=MOPPOConfig(num_envs=64 if on_accel else 4, steps_per_iteration=spi),
        vectorized=True,
    )
    agent = PGMORL(env, origin=np.zeros(env.reward_dim), config=cfg)
    proto = agent.agents[0]
    states = [proto.init_state(jax.random.key(i)) for i in range(pop)]
    stacked = agent._stack(states)
    ws = jnp.stack([jnp.asarray(a.w, dtype=jnp.float32) for a in agent.agents])
    dt = _time(lambda st: agent._train_all_vec(st, ws), stacked)
    _emit("pgmorl_halfcheetah_env_steps_per_sec_per_chip", pop * spi / dt)


def bench_morld_halfcheetah(on_accel: bool) -> None:
    """MORL/D vectorized population: 6 MOSAC members train + shared-buffer
    cooperation passes in one XLA program on planar mo-halfcheetah-jx."""
    from morl_baselines_tpu.agents.morld import MORLD, MORLDConfig
    from morl_baselines_tpu.agents.mosac import MOSACConfig
    from morl_baselines_tpu.envs import make

    pop = 6
    num_envs = 256 if on_accel else 4
    seg_iters = 32 if on_accel else 2
    env = make("mo-halfcheetah-jx-v5")
    cfg = MORLDConfig(
        pop_size=pop,
        vectorized=True,
        sac=MOSACConfig(num_envs=num_envs, learning_starts=num_envs, buffer_size=16384),
    )
    algo = MORLD(env, cfg)
    agent = algo.population[0]
    states = jax.vmap(agent.init_state)(jax.random.split(jax.random.key(0), pop))
    buffers = jax.tree.map(lambda x: jnp.repeat(jnp.asarray(x)[None], pop, axis=0), agent.make_buffer())
    weights = jnp.stack([jnp.asarray(w, dtype=jnp.float32) for w in algo.weights])
    dt = _time(
        lambda st, bu: algo._pop_step(st, bu, weights, seg_iters, cfg.update_passes, jax.random.key(1)),
        states,
        buffers,
    )
    _emit("morld_halfcheetah_env_steps_per_sec_per_chip", pop * seg_iters * num_envs / dt)


def bench_pareto_kernel(on_accel: bool) -> None:
    """Pallas tiled non-dominated mask on an archive-scale front (the
    large-front pruning path of DeviceParetoFront/device_front_metrics).
    On the chip: asserts bitwise agreement with the jnp mask in COMPILED
    (non-interpret) mode, then times both.  For this line only, vs_baseline
    is the kernel's speedup over the jnp XLA mask on the same device."""
    from morl_baselines_tpu.core.pareto import non_dominated_mask
    from morl_baselines_tpu.ops.pareto_kernel import non_dominated_mask_pallas

    n = 8192 if on_accel else 512
    pts = jax.random.normal(jax.random.key(0), (n, 3))
    jnp_mask = jax.jit(lambda p: non_dominated_mask(p, None, False))
    if on_accel:
        m1 = np.asarray(non_dominated_mask_pallas(pts, keep_duplicates=False))
        m2 = np.asarray(jnp_mask(pts))
        assert (m1 == m2).all(), "pallas mask disagrees with jnp mask on chip"
        dt_k = _time(lambda p: non_dominated_mask_pallas(p, keep_duplicates=False), pts)
        dt_j = _time(jnp_mask, pts)
        print(
            json.dumps(
                {
                    "metric": f"pareto_nd_mask_n{n}_rows_per_sec",
                    "value": round(n / dt_k, 1),
                    "unit": "rows/s",
                    "vs_baseline": round(dt_j / dt_k, 2),
                }
            ),
            flush=True,
        )
    else:
        dt_j = _time(jnp_mask, pts)
        print(
            json.dumps(
                {
                    "metric": f"pareto_nd_mask_n{n}_rows_per_sec",
                    "value": round(n / dt_j, 1),
                    "unit": "rows/s",
                    "vs_baseline": 1.0,
                }
            ),
            flush=True,
        )


def bench_envelope_minecart(on_accel: bool) -> None:
    """Headline: the round-1 Envelope/minecart full actor-learner workload
    (N vectorized envs + envelope-target updates at 1-update-per-2048-steps)."""
    from morl_baselines_tpu.agents.envelope import Envelope, EnvelopeConfig
    from morl_baselines_tpu.envs import make

    num_envs = 32768 if on_accel else 64
    grad_updates = 16 if on_accel else 1
    iters = 100 if on_accel else 20
    env = make("minecart-v0")
    cfg = EnvelopeConfig(
        num_envs=num_envs,
        buffer_size=max(4 * num_envs, 65536) if on_accel else 4096,
        batch_size=128,
        learning_starts=num_envs,
        gradient_updates=grad_updates,
        train_freq=1,
        num_sample_w=4,
    )
    agent = Envelope(env, cfg)
    state = agent.init_state(jax.random.key(0))
    dt = _time(lambda s: agent.train_segment(s, iters), state)
    _emit("envelope_minecart_env_steps_per_sec_per_chip", iters * num_envs / dt)


def main() -> None:
    on_accel = jax.devices()[0].platform not in ("cpu",)
    suite = [
        bench_gpils_minecart,
        bench_gpils_cont_hopper,
        bench_pgmorl_halfcheetah,
        bench_morld_halfcheetah,
        bench_pareto_kernel,
        bench_envelope_minecart,  # headline LAST
    ]
    if "--headline-only" in sys.argv:
        suite = [bench_envelope_minecart]
    failures = 0
    for fn in suite:
        try:
            fn(on_accel)
        except Exception:  # a broken workload must not mask the others
            failures += 1
            traceback.print_exc(file=sys.stderr)
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
