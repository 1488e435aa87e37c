"""Pure-JAX planar hopper/halfcheetah: physics parity + env contract.

The in-air (contact-free) trajectories are checked against real MuJoCo — that
isolates the Lagrangian dynamics (mass matrix, Coriolis, gravity, springs,
damping, armature, gears) from the intentionally-different contact model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morl_baselines_tpu.envs import make
from morl_baselines_tpu.envs.planar import MOHalfCheetahJX, MOHopperJX, PlanarState


def _mujoco_env(gid):
    import gymnasium

    kw = {"terminate_when_unhealthy": False} if "Hopper" in gid else {}
    env = gymnasium.make(gid, max_episode_steps=-1, **kw)
    env.reset(seed=0)
    return env


def test_hopper_inair_parity_vs_mujoco():
    """Ballistic (no contact, within joint limits) trajectories match MuJoCo
    to integrator tolerance."""
    env = MOHopperJX()
    genv = _mujoco_env("Hopper-v5")
    q0 = np.array([0, 2.5, 0.1, -0.5, -0.4, 0.2])
    qd0 = 0.3 * np.ones(6)
    genv.unwrapped.set_state(q0.astype(float), qd0)
    s = PlanarState(jnp.asarray(q0, dtype=jnp.float32), jnp.asarray(qd0, dtype=jnp.float32), jnp.int32(0))
    step = jax.jit(env.step)
    rng = np.random.default_rng(1)
    for t in range(10):
        a = rng.uniform(-1, 1, 3)
        genv.step(a)
        out = step(s, jnp.asarray(a, dtype=jnp.float32), jax.random.key(t))
        s = out.state
        assert np.max(np.abs(np.asarray(s.q) - genv.unwrapped.data.qpos)) < 0.02


def test_halfcheetah_inair_parity_vs_mujoco():
    env = MOHalfCheetahJX()
    genv = _mujoco_env("HalfCheetah-v5")
    q0 = np.array([0, 2.0, 0.2, 0.2, -0.2, 0.1, -0.2, 0.2, -0.1])
    qd0 = 0.1 * np.ones(9)
    genv.unwrapped.set_state(q0.astype(float), qd0)
    s = PlanarState(jnp.asarray(q0, dtype=jnp.float32), jnp.asarray(qd0, dtype=jnp.float32), jnp.int32(0))
    step = jax.jit(env.step)
    for t in range(8):
        genv.step(np.zeros(6))
        out = step(s, jnp.zeros(6), jax.random.key(t))
        s = out.state
        # stiff leg springs accumulate integrator drift; class-of-motion match
        assert np.max(np.abs(np.asarray(s.q) - genv.unwrapped.data.qpos)) < 0.05


def test_hopper_standing_equilibrium_matches_mujoco():
    """With zero torque the hopper settles on its foot at the same height as
    MuJoCo (contact model carries the weight at the right penetration)."""
    env = MOHopperJX()
    s = PlanarState(jnp.asarray([0, 1.25, 0, 0, 0, 0.0]), jnp.zeros(6), jnp.int32(0))
    step = jax.jit(env.step)
    for t in range(30):
        out = step(s, jnp.zeros(3), jax.random.key(t))
        s = out.state
    assert abs(float(s.q[1]) - 1.205) < 0.02  # MuJoCo settles at ~1.204-1.208
    assert abs(float(s.q[2])) < 0.05


def test_planar_env_contract():
    """Registry, obs/reward shapes, termination, vmap + scan stepping."""
    for name, obs_dim, act_dim, d in [
        ("mo-hopper-jx-v5", 11, 3, 3),
        ("mo-halfcheetah-jx-v5", 17, 6, 2),
    ]:
        env = make(name)
        assert env.name == name
        s, obs = env.reset(jax.random.key(0))
        assert obs.shape == (obs_dim,)
        out = env.step(s, jnp.zeros(act_dim), jax.random.key(1))
        assert out.reward.shape == (d,)

    # batched device stepping: N envs under vmap inside a scanned jit
    env = make("mo-hopper-jx-v5")
    N = 16
    keys = jax.random.split(jax.random.key(0), N)
    state, obs = jax.vmap(env.reset)(keys)

    def body(carry, key):
        st = carry
        ks = jax.random.split(key, N)
        out = jax.vmap(env.step)(st, jnp.zeros((N, 3)), ks)
        return out.state, (out.reward, out.terminated)

    st, (rews, terms) = jax.jit(
        lambda st: jax.lax.scan(body, st, jax.random.split(jax.random.key(1), 80))
    )(state)
    assert rews.shape == (80, N, 3)
    # passive hoppers settle on the foot (joint limits act as hard stops),
    # exactly as MuJoCo's does — all healthy, standing near equilibrium
    assert not bool(jnp.any(terms))
    assert np.all(np.abs(np.asarray(st.q[:, 1]) - 1.205) < 0.05)
    assert not bool(jnp.any(jnp.isnan(rews)))


def test_hopper_hops_under_thrust():
    """A simple periodic thrust gait produces forward motion and airborne
    phases — the contact + actuation path transfers momentum."""
    env = MOHopperJX()
    s, _ = env.reset(jax.random.key(0))
    step = jax.jit(env.step)
    xs, zs = [], []
    for t in range(100):
        # periodic ankle thrust: a crude but effective hop gait
        a = jnp.asarray([0.0, 0.0, 1.0 if (t // 10) % 2 == 0 else -1.0])
        out = step(s, a, jax.random.key(t))
        s = out.state
        xs.append(float(s.q[0]))
        zs.append(float(s.q[1]))
        if bool(out.terminated):
            break
    assert max(zs) > 1.28  # airborne phases
    assert xs[-1] > 0.1  # net forward motion
