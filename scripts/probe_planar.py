"""Microbenchmark the planar env step to locate the population-workload bound.

Times, at bench-like batch sizes on the real chip:
  1. the full vectorized halfcheetah-jx step,
  2. the _qdd dynamics solve alone (autodiff M/coriolis + linalg.solve),
  3. the batched 9x9 linalg.solve alone vs a Cholesky solve (M is SPD),
so the RESULTS_r4 analysis can name the dominant term. One JSON line each.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def med(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main(batch: int = 24576):
    from morl_baselines_tpu.envs import make
    from morl_baselines_tpu.envs.planar import _qdd
    from morl_baselines_tpu.envs.vector import VectorMOEnv

    env = make("mo-halfcheetah-jx-v5")
    venv = VectorMOEnv(env, batch)
    key = jax.random.key(0)
    state, obs = venv.reset(key)
    acts = jnp.zeros((batch, env.nu))
    step = jax.jit(venv.step)
    dt = med(lambda: step(state, acts, key))
    emitted = {"probe": "full_step", "batch": batch, "seconds": round(dt, 4),
               "rows_per_sec": round(batch / dt, 1)}
    print(json.dumps(emitted), flush=True)

    nq = env.nq
    q = jax.random.normal(jax.random.key(1), (batch, nq)) * 0.1
    qd = jax.random.normal(jax.random.key(2), (batch, nq)) * 0.1
    tau = jnp.zeros((batch, nq))
    qdd_fn = jax.jit(jax.vmap(lambda q_, qd_, t_: _qdd(env.model, q_, qd_, t_)))
    dt = med(lambda: qdd_fn(q, qd, tau))
    print(json.dumps({"probe": "qdd_only", "batch": batch, "seconds": round(dt, 4),
                      "per_substep_x_nsub": round(dt * env.n_sub, 4)}), flush=True)

    M = jnp.eye(nq)[None] * (1.0 + jax.random.uniform(jax.random.key(3), (batch, 1, 1)))
    M = M + 0.05 * jax.random.normal(jax.random.key(4), (batch, nq, nq))
    M = jnp.einsum("bij,bkj->bik", M, M) + 0.1 * jnp.eye(nq)[None]  # SPD
    rhs = jax.random.normal(jax.random.key(5), (batch, nq))
    lin = jax.jit(lambda M_, r_: jnp.linalg.solve(M_, r_[..., None])[..., 0])
    dt = med(lambda: lin(M, rhs))
    print(json.dumps({"probe": "linalg_solve_9x9", "batch": batch, "seconds": round(dt, 4)}), flush=True)

    def cho(M_, r_):
        L = jnp.linalg.cholesky(M_)
        y = jax.scipy.linalg.solve_triangular(L, r_[..., None], lower=True)
        return jax.scipy.linalg.solve_triangular(
            jnp.swapaxes(L, -1, -2), y, lower=False
        )[..., 0]

    cho_j = jax.jit(cho)
    dt = med(lambda: cho_j(M, rhs))
    print(json.dumps({"probe": "cholesky_solve_9x9", "batch": batch, "seconds": round(dt, 4)}), flush=True)

    # explicit unrolled Gaussian elimination (static 9x9) — no LAPACK-style
    # batched kernel, just fused VPU ops
    def gauss(M_, r_):
        A = jnp.concatenate([M_, r_[..., None]], axis=-1)
        n = M_.shape[-1]
        for k in range(n):
            piv = A[:, k, k][:, None]
            row = A[:, k, :] / piv
            A = A.at[:, k, :].set(row)
            factors = A[:, :, k].at[:, k].set(0.0)
            A = A - factors[:, :, None] * row[:, None, :]
        return A[:, :, n]

    gauss_j = jax.jit(gauss)
    ok = np.allclose(np.asarray(gauss_j(M, rhs)), np.asarray(lin(M, rhs)), rtol=1e-3, atol=1e-4)
    dt = med(lambda: gauss_j(M, rhs))
    print(json.dumps({"probe": "unrolled_gauss_9x9", "batch": batch, "seconds": round(dt, 4),
                      "matches_solve": bool(ok)}), flush=True)


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 24576
    main(b)
