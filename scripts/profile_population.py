"""Profile the population workloads (VERDICT r3 next-step #4).

pgmorl/morld sit ~400x below the envelope headline in BENCH; this script
decomposes their bench operating points on the real chip to show WHAT bounds
them:

  1. phase split: rollout-only vs update-only wall-clock per PPO iteration
     (PGMORL) and env-stepping vs cooperation updates (MORL/D);
  2. an env-count sweep at a fixed per-iteration step budget: a latency-bound
     program (long sequential chains of tiny kernels) shows steps/s rising
     ~linearly with envs-per-step, a bandwidth/FLOP-bound one stays flat;
  3. optional jax.profiler trace (--trace DIR) for xprof.

Prints one JSON line per measurement to stdout; run AFTER any TPU queue
drains (single chip).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
except Exception:
    pass

sys.path.insert(0, "/root/repo")


def _med_time(fn, *args, reps: int = 3) -> float:
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def emit(**kw):
    print(json.dumps(kw), flush=True)


def profile_pgmorl(num_envs: int = 64, spi: int = 8192, pop: int = 6):
    from morl_baselines_tpu.agents.moppo import MOPPOConfig
    from morl_baselines_tpu.agents.pgmorl import PGMORL, PGMORLConfig
    from morl_baselines_tpu.envs import make

    env = make("mo-halfcheetah-jx-v5")
    cfg = PGMORLConfig(
        pop_size=pop, ppo=MOPPOConfig(num_envs=num_envs, steps_per_iteration=spi), vectorized=True
    )
    agent = PGMORL(env, origin=np.zeros(env.reward_dim), config=cfg)
    proto = agent.agents[0]
    states = [proto.init_state(jax.random.key(i)) for i in range(pop)]
    stacked = agent._stack(states)
    ws = jnp.stack([jnp.asarray(a.w, dtype=jnp.float32) for a in agent.agents])

    # full iteration (rollout + GAE + 10x32 minibatch updates)
    dt_full = _med_time(lambda st: agent._train_all_vec(st, ws), stacked)
    T = spi // num_envs

    # isolate the sequential update chain with a 1-rollout-step config that
    # still runs the full 10 epochs x 32 minibatches; dt_full - dt_upd ~ rollout
    cfg1 = PGMORLConfig(
        pop_size=pop,
        ppo=MOPPOConfig(num_envs=num_envs, steps_per_iteration=num_envs),  # T=1 rollout step
        vectorized=True,
    )
    agent1 = PGMORL(env, origin=np.zeros(env.reward_dim), config=cfg1)
    proto1 = agent1.agents[0]
    st1 = agent1._stack([proto1.init_state(jax.random.key(i)) for i in range(pop)])
    dt_upd = _med_time(lambda st: agent1._train_all_vec(st, ws), st1)
    # NOTE: cfg1 still runs 10 epochs x 32 minibatches on the 1-step batch, so
    # dt_upd isolates the sequential update chain; dt_full - dt_upd ~ rollout.
    emit(
        workload="pgmorl", num_envs=num_envs, steps_per_iteration=spi, pop=pop,
        iteration_s=round(dt_full, 4), update_chain_s=round(dt_upd, 4),
        rollout_s=round(dt_full - dt_upd, 4),
        env_steps_per_sec=round(pop * spi / dt_full, 1),
        rollout_steps=T, sequential_updates=cfg.ppo.update_epochs * cfg.ppo.num_minibatches,
    )


def profile_morld(num_envs: int = 256, seg_iters: int = 32, pop: int = 6):
    from morl_baselines_tpu.agents.morld import MORLD, MORLDConfig
    from morl_baselines_tpu.agents.mosac import MOSACConfig
    from morl_baselines_tpu.envs import make

    env = make("mo-halfcheetah-jx-v5")
    cfg = MORLDConfig(
        pop_size=pop, vectorized=True,
        sac=MOSACConfig(num_envs=num_envs, learning_starts=num_envs, buffer_size=16384),
    )
    algo = MORLD(env, cfg)
    agent = algo.population[0]
    states = jax.vmap(agent.init_state)(jax.random.split(jax.random.key(0), pop))
    buffers = jax.tree.map(lambda x: jnp.repeat(jnp.asarray(x)[None], pop, axis=0), agent.make_buffer())
    weights = jnp.stack([jnp.asarray(w, dtype=jnp.float32) for w in algo.weights])

    dt_full = _med_time(
        lambda st, bu: algo._pop_step(st, bu, weights, seg_iters, cfg.update_passes, jax.random.key(1)),
        states, buffers,
    )
    dt_nocoop = _med_time(
        lambda st, bu: algo._pop_step(st, bu, weights, seg_iters, 0, jax.random.key(1)),
        states, buffers,
    )
    emit(
        workload="morld", num_envs=num_envs, seg_iters=seg_iters, pop=pop,
        segment_s=round(dt_full, 4), coop_updates_s=round(dt_full - dt_nocoop, 4),
        train_segment_s=round(dt_nocoop, 4),
        env_steps_per_sec=round(pop * seg_iters * num_envs / dt_full, 1),
    )


def sweep_envs():
    for n in (64, 256, 1024, 4096):
        profile_pgmorl(num_envs=n, spi=8192)
    for n in (256, 1024, 4096):
        profile_morld(num_envs=n)


if __name__ == "__main__":
    trace_dir = None
    for a in sys.argv[1:]:
        if a.startswith("--trace="):
            trace_dir = a.split("=", 1)[1]
    if trace_dir:
        from morl_baselines_tpu.utils.profiling import trace

        with trace(trace_dir):
            profile_pgmorl()
            profile_morld()
    elif "--sweep" in sys.argv:
        sweep_envs()
    else:
        profile_pgmorl()
        profile_morld()
