"""Pure-JAX planar MuJoCo-class locomotion — device-resident mo-hopper/mo-halfcheetah.

TPU-native replacement for the host-stepped MuJoCo adapter (envs/mujoco.py):
the BASELINE continuous-control configs (reference examples/gpi_pd_mo_hopper.py,
tests/test_algos.py:220-232) need thousands of envs stepping *inside* the
jitted program, which the per-step host round-trip can never give.

Physical constants (masses, y-inertias, joint anchors/axes/ranges, gears,
damping, armature, stiffness, capsule geometry, friction) are read ONCE at
construction from the official gymnasium MuJoCo XMLs via ``mujoco.MjModel``
— data only, no ported code.  The dynamics are re-derived TPU-first:

- Planar (x, z, rotation-about-y) articulated chain; generalized coordinates
  q are exactly MuJoCo's qpos so observations keep gymnasium semantics.
- Lagrangian equations of motion via autodiff: kinetic energy from one
  ``jax.jvp`` through forward kinematics, mass matrix = d(dT/dqd)/dqd via
  ``jacfwd``, Coriolis/centrifugal and gravity/spring terms from gradients.
  Everything is a handful of tiny batched matrix ops that vmap over
  thousands of envs.
- Ground contact: smooth spring-damper penalty at capsule endpoints with
  tanh-regularized Coulomb friction (MuJoCo's LCP solver is inherently
  sequential/host-hostile; a compliant contact model is the standard
  accelerator-native choice, as in Brax/MJX positional variants).
- Joint limits as stiff one-sided penalties; semi-implicit Euler substeps
  under ``lax.scan``.

Deviations from MuJoCo (documented): penalty contacts instead of constraint
solver; planar projection (these models are planar by construction, so only
out-of-plane DOFs are lost — there are none).  In-air (contact-free)
trajectories match MuJoCo numerically (see tests/test_planar.py).

MO reward decompositions mirror envs/mujoco.py so the two paths are
interchangeable:
- hopper (3): forward velocity, 10*(height - 1.25), -2e-4 * sum(a^2)
- halfcheetah (2): forward velocity, -0.1 * sum(a^2)
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import Box, MOEnv, StepOut

_G = 9.81


class PlanarModel(NamedTuple):
    """Static parameters of a planar kinematic chain (all jnp, shapes fixed)."""

    parent: tuple  # (nb,) python ints, -1 for root
    body_pos: jnp.ndarray  # (nb, 2) frame origin in parent frame
    jnt_pos: jnp.ndarray  # (nb, 2) hinge anchor in body frame (root: rooty anchor)
    jnt_sign: jnp.ndarray  # (nb,) +1/-1 = y-component of the hinge axis
    jnt_dof: tuple  # (nb,) python ints: index into q of the body's hinge
    ipos: jnp.ndarray  # (nb, 2) com in body frame
    mass: jnp.ndarray  # (nb,)
    inertia: jnp.ndarray  # (nb,) Iyy about the com
    armature: jnp.ndarray  # (nq,)
    damping: jnp.ndarray  # (nq,)
    stiffness: jnp.ndarray  # (nq,)
    qpos_spring: jnp.ndarray  # (nq,)
    jnt_lo: jnp.ndarray  # (nq,) -inf where unlimited
    jnt_hi: jnp.ndarray  # (nq,)
    gear: jnp.ndarray  # (nu,)
    act_dof: tuple  # (nu,) python ints
    cp_body: tuple  # (nc,) python ints: contact-sphere body
    cp_local: jnp.ndarray  # (nc, 2)
    cp_radius: jnp.ndarray  # (nc,)
    cp_mu: jnp.ndarray  # (nc,)
    qpos0: jnp.ndarray  # (nq,)


@lru_cache(maxsize=4)
def _build_planar_model(xml_name: str) -> tuple:
    """Host-side, init-time only: read physical constants from the official
    gymnasium asset via mujoco.MjModel and project onto the x-z plane."""
    import os

    import gymnasium.envs.mujoco as gm
    import mujoco

    path = os.path.join(os.path.dirname(gm.__file__), "assets", xml_name)
    m = mujoco.MjModel.from_xml_path(path)

    nb = m.nbody - 1  # drop world
    nq = m.nq
    parent, body_pos, jnt_pos, jnt_sign, jnt_dof = [], [], [], [], []
    ipos, mass, inertia = [], [], []
    jnt_lo = np.full(nq, -np.inf)
    jnt_hi = np.full(nq, np.inf)
    for b in range(1, m.nbody):
        parent.append(int(m.body_parentid[b]) - 1)
        body_pos.append(m.body_pos[b][[0, 2]])
        ipos.append(m.body_ipos[b][[0, 2]])
        mass.append(m.body_mass[b])
        inertia.append(m.body_inertia[b][1])  # Iyy
        # the body's own hinge (root body: its rooty hinge)
        hinge = None
        for j in range(m.njnt):
            if m.jnt_bodyid[j] == b and m.jnt_type[j] == mujoco.mjtJoint.mjJNT_HINGE:
                hinge = j
        assert hinge is not None, f"body {b} has no hinge"
        jnt_pos.append(m.jnt_pos[hinge][[0, 2]])
        jnt_sign.append(float(m.jnt_axis[hinge][1]))
        dof = int(m.jnt_dofadr[hinge])
        jnt_dof.append(dof)
        if m.jnt_limited[hinge]:
            jnt_lo[dof], jnt_hi[dof] = m.jnt_range[hinge]

    armature = np.zeros(nq)
    damping = np.zeros(nq)
    stiffness = np.zeros(nq)
    for j in range(m.njnt):
        d = int(m.jnt_dofadr[j])
        armature[d] = m.dof_armature[d]
        damping[d] = m.dof_damping[d]
        stiffness[d] = m.jnt_stiffness[j]

    gear = m.actuator_gear[:, 0].copy()
    act_dof = [int(m.jnt_dofadr[m.actuator_trnid[u, 0]]) for u in range(m.nu)]

    # contact spheres: both endpoints of every non-floor capsule geom
    floor_mu = 1.0
    cp_body, cp_local, cp_radius, cp_mu = [], [], [], []
    for g in range(m.ngeom):
        if m.geom_bodyid[g] == 0:
            floor_mu = float(m.geom_friction[g][0])
            continue
    for g in range(m.ngeom):
        b = int(m.geom_bodyid[g])
        if b == 0 or m.geom_type[g] != mujoco.mjtGeom.mjGEOM_CAPSULE:
            continue
        r, half = float(m.geom_size[g][0]), float(m.geom_size[g][1])
        # pure y-rotation quats (w, 0, qy, 0) in these planar models
        w, qy = float(m.geom_quat[g][0]), float(m.geom_quat[g][2])
        theta = 2.0 * np.arctan2(qy, w)
        axis = np.array([np.sin(theta) * half, np.cos(theta) * half])  # (x, z)
        for sgn in (+1.0, -1.0):
            cp_body.append(b - 1)
            cp_local.append(m.geom_pos[g][[0, 2]] + sgn * axis)
            cp_radius.append(r)
            cp_mu.append(max(float(m.geom_friction[g][0]), floor_mu))

    model = PlanarModel(
        parent=tuple(parent),
        body_pos=jnp.asarray(np.stack(body_pos), dtype=jnp.float32),
        jnt_pos=jnp.asarray(np.stack(jnt_pos), dtype=jnp.float32),
        jnt_sign=jnp.asarray(jnt_sign, dtype=jnp.float32),
        jnt_dof=tuple(jnt_dof),
        ipos=jnp.asarray(np.stack(ipos), dtype=jnp.float32),
        mass=jnp.asarray(mass, dtype=jnp.float32),
        inertia=jnp.asarray(inertia, dtype=jnp.float32),
        armature=jnp.asarray(armature, dtype=jnp.float32),
        damping=jnp.asarray(damping, dtype=jnp.float32),
        stiffness=jnp.asarray(stiffness, dtype=jnp.float32),
        qpos_spring=jnp.asarray(m.qpos_spring.ravel(), dtype=jnp.float32),
        jnt_lo=jnp.asarray(jnt_lo, dtype=jnp.float32),
        jnt_hi=jnp.asarray(jnt_hi, dtype=jnp.float32),
        gear=jnp.asarray(gear, dtype=jnp.float32),
        act_dof=tuple(act_dof),
        cp_body=tuple(cp_body),
        cp_local=jnp.asarray(np.stack(cp_local), dtype=jnp.float32),
        cp_radius=jnp.asarray(cp_radius, dtype=jnp.float32),
        cp_mu=jnp.asarray(cp_mu, dtype=jnp.float32),
        qpos0=jnp.asarray(m.qpos0.ravel(), dtype=jnp.float32),
    )
    return model, float(m.opt.timestep), int(nq), int(m.nu)


# ---------------------------------------------------------------------------
# Dynamics — Lagrangian EOM via autodiff, everything differentiable jnp
# ---------------------------------------------------------------------------


def _rot(a):
    """Planar rotation about +y: (x, z) -> (x cos a + z sin a, -x sin a + z cos a)."""
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.array([[c, s], [-s, c]])


def _fk(model: PlanarModel, q: jnp.ndarray):
    """Forward kinematics: world origins (nb, 2) and angles (nb,) per body.

    Joint displacements are (q - qpos0): MuJoCo joints carry a ``ref`` value
    (e.g. hopper's rootz ref=1.25) at which the body sits at its declared
    body_pos; observations still report raw q, matching gymnasium.
    """
    nb = len(model.parent)
    dq = q - model.qpos0
    origins, angles = [], []
    for b in range(nb):
        if model.parent[b] < 0:
            alpha = model.jnt_sign[b] * dq[2]
            base = model.body_pos[b] + dq[:2]
            anchor = base + model.jnt_pos[b]
            o = anchor - _rot(alpha) @ model.jnt_pos[b]
        else:
            p = model.parent[b]
            anchor = origins[p] + _rot(angles[p]) @ (model.body_pos[b] + model.jnt_pos[b])
            alpha = angles[p] + model.jnt_sign[b] * dq[model.jnt_dof[b]]
            o = anchor - _rot(alpha) @ model.jnt_pos[b]
        origins.append(o)
        angles.append(alpha)
    return jnp.stack(origins), jnp.stack(angles)


def _coms_angles(model: PlanarModel, q: jnp.ndarray):
    o, a = _fk(model, q)
    coms = o + jax.vmap(lambda ang, u: _rot(ang) @ u)(a, model.ipos)
    return coms, a


def _kinetic(model: PlanarModel, q: jnp.ndarray, qd: jnp.ndarray) -> jnp.ndarray:
    _, (dcoms, dang) = jax.jvp(lambda qq: _coms_angles(model, qq), (q,), (qd,))
    T = 0.5 * jnp.sum(model.mass * jnp.sum(dcoms**2, axis=-1))
    T = T + 0.5 * jnp.sum(model.inertia * dang**2)
    return T + 0.5 * jnp.sum(model.armature * qd**2)


def _potential(model: PlanarModel, q: jnp.ndarray) -> jnp.ndarray:
    coms, _ = _coms_angles(model, q)
    v = _G * jnp.sum(model.mass * coms[:, 1])
    return v + 0.5 * jnp.sum(model.stiffness * (q - model.qpos_spring) ** 2)


def _contact_points(model: PlanarModel, q: jnp.ndarray):
    o, a = _fk(model, q)
    body = jnp.asarray(model.cp_body)
    return o[body] + jax.vmap(lambda ang, u: _rot(ang) @ u)(a[body], model.cp_local)


def _contact_tau(model: PlanarModel, q, qd, kp: float, kd: float, v_slip: float):
    """Generalized ground-contact forces: penalty normal + smooth friction."""
    pts, dpts = jax.jvp(lambda qq: _contact_points(model, qq), (q,), (qd,))
    pen = model.cp_radius - pts[:, 1]  # > 0 when penetrating the z=0 plane
    active = pen > 0.0
    fn = jnp.where(active, kp * pen - kd * dpts[:, 1], 0.0)
    fn = jnp.maximum(fn, 0.0)
    ft = -model.cp_mu * fn * jnp.tanh(dpts[:, 0] / v_slip)
    f = jnp.stack([ft, fn], axis=-1)  # (nc, 2)
    _, vjp = jax.vjp(lambda qq: _contact_points(model, qq), q)
    return vjp(f)[0]


def _limit_tau(model: PlanarModel, q, qd, k_lim: float, d_lim: float):
    over = jnp.maximum(q - model.jnt_hi, 0.0)
    under = jnp.maximum(model.jnt_lo - q, 0.0)
    viol = (over > 0) | (under > 0)
    return -k_lim * over + k_lim * under - jnp.where(viol, d_lim * qd, 0.0)


def _solve_unrolled(M, rhs):
    """Solve M x = rhs by Gaussian elimination unrolled over the static DOF
    count (M is the SPD mass matrix, so no pivoting is needed).  The batched
    LAPACK-style `jnp.linalg.solve` kernel is 3.4x slower on TPU at these
    tiny sizes (scripts/probe_planar.py); unrolled elimination is pure fused
    VPU ops."""
    n = M.shape[-1]
    A = jnp.concatenate([M, rhs[:, None]], axis=-1)  # (n, n+1)
    for k in range(n):
        row = A[k, :] / A[k, k]
        A = A.at[k, :].set(row)
        factors = A[:, k].at[k].set(0.0)
        A = A - factors[:, None] * row[None, :]
    return A[:, n]


def _qdd(model: PlanarModel, q, qd, tau):
    """Solve M(q) qdd = tau + dT/dq - dV/dq - (d(dT/dqd)/dq) qd.

    The model is closure-captured (not a transform argument) so its python-int
    topology fields stay static under grad/jacfwd.
    """
    T = lambda q_, qd_: _kinetic(model, q_, qd_)
    p_fn = jax.grad(T, argnums=1)  # momentum dT/dqd
    M = jax.jacfwd(p_fn, argnums=1)(q, qd)
    dTdq = jax.grad(T, argnums=0)(q, qd)
    dVdq = jax.grad(lambda q_: _potential(model, q_))(q)
    # (d p/d q) qd as ONE directional jvp — materializing the full (nq, nq)
    # Jacobian with jacfwd and contracting costs nq forward passes
    coriolis = jax.jvp(lambda q_: p_fn(q_, qd), (q,), (qd,))[1]
    rhs = tau + dTdq - dVdq - coriolis
    return _solve_unrolled(M, rhs)


class PlanarState(NamedTuple):
    q: jnp.ndarray
    qd: jnp.ndarray
    t: jnp.ndarray


class PlanarMOEnv(MOEnv):
    """Generic planar locomotion MOEnv: substepped semi-implicit Euler."""

    # contact/limit penalty parameters (per-env overrides below)
    kp: float = 2.0e4
    kd: float = 400.0
    v_slip: float = 0.05
    k_lim: float = 4000.0
    d_lim: float = 40.0
    reset_noise: float = 5e-3
    n_sub: int = 4  # integration substeps per control step
    frame_skip: int = 4

    def __init__(self, xml_name: str, name: str, max_episode_steps: int = 1000):
        self.model, self._mj_dt, self.nq, self.nu = _build_planar_model(xml_name)
        self.name = name
        self.max_episode_steps = max_episode_steps
        self.action_space = Box(low=tuple(-np.ones(self.nu)), high=tuple(np.ones(self.nu)))

    @property
    def _dt_int(self) -> float:
        """Integration dt: frame_skip MuJoCo steps split into n_sub substeps."""
        return self._mj_dt * self.frame_skip / self.n_sub

    # -- generic physics -----------------------------------------------------

    def _substep(self, carry, _):
        q, qd, act_tau = carry
        model = self.model
        tau = act_tau - model.damping * qd
        tau = tau + _limit_tau(model, q, qd, self.k_lim, self.d_lim)
        tau = tau + _contact_tau(model, q, qd, self.kp, self.kd, self.v_slip)
        qdd = _qdd(model, q, qd, tau)
        dt = self._dt_int
        qd = qd + dt * qdd
        q = q + dt * qd
        return (q, qd, act_tau), None

    def _physics(self, q, qd, action):
        act_tau = jnp.zeros(self.nq).at[jnp.asarray(self.model.act_dof)].add(
            self.model.gear * jnp.clip(action, -1.0, 1.0)
        )
        (q, qd, _), _ = jax.lax.scan(self._substep, (q, qd, act_tau), None, length=self.n_sub)
        return q, qd

    def reset(self, key: jax.Array):
        kq, kv = jax.random.split(key)
        q = self.model.qpos0 + jax.random.uniform(
            kq, (self.nq,), minval=-self.reset_noise, maxval=self.reset_noise
        )
        qd = jax.random.uniform(kv, (self.nq,), minval=-self.reset_noise, maxval=self.reset_noise)
        s = PlanarState(q, qd, jnp.int32(0))
        return s, self._obs(s)

    # subclasses: _obs, _mo_reward, _terminated

    def step(self, state: PlanarState, action, key: jax.Array) -> StepOut:
        a = jnp.asarray(action, dtype=jnp.float32).reshape(self.nu)
        x_before = state.q[0]
        q, qd = self._physics(state.q, state.qd, a)
        t = state.t + 1
        s = PlanarState(q, qd, t)
        vx = (q[0] - x_before) / (self._mj_dt * self.frame_skip)
        reward = self._mo_reward(s, a, vx)
        term = self._terminated(s)
        return StepOut(s, self._obs(s), reward, term, t >= self.max_episode_steps)


class MOHopperJX(PlanarMOEnv):
    """Device-resident mo-hopper (3 objectives; gymnasium Hopper-v5 physics).

    Observation = [qpos[1:], clip(qvel, ±10)] (11,), actions 3, healthy
    termination as gymnasium (z > 0.7, |angle| < 0.2, |state[2:]| < 100).
    """

    reward_dim = 3
    frame_skip = 4
    n_sub = 4

    def __init__(self, max_episode_steps: int = 1000):
        super().__init__("hopper.xml", "mo-hopper-jx-v5", max_episode_steps)
        self.observation_space = Box(low=tuple(np.full(11, -np.inf)), high=tuple(np.full(11, np.inf)))

    def _obs(self, s: PlanarState) -> jnp.ndarray:
        return jnp.concatenate([s.q[1:], jnp.clip(s.qd, -10.0, 10.0)]).astype(jnp.float32)

    def _mo_reward(self, s, a, vx):
        height = 10.0 * (s.q[1] - 1.25)
        energy = -2e-4 * jnp.sum(jnp.square(a))
        return jnp.stack([vx, height, energy]).astype(jnp.float32)

    def _terminated(self, s: PlanarState) -> jnp.ndarray:
        state_tail = jnp.concatenate([s.q[2:], s.qd])
        healthy = (
            (s.q[1] > 0.7)
            & (jnp.abs(s.q[2]) < 0.2)
            & jnp.all(jnp.abs(state_tail) < 100.0)
        )
        return ~healthy


class MOHalfCheetahJX(PlanarMOEnv):
    """Device-resident mo-halfcheetah (2 objectives; HalfCheetah-v5 physics).

    Observation = [qpos[1:], qvel] (17,), actions 6, no termination.
    Stiff leg springs (k up to 240) need a finer integration dt: 4 substeps
    per 0.01s MuJoCo step x frame_skip 5 = 20 substeps per control step.
    """

    reward_dim = 2
    frame_skip = 5
    n_sub = 20

    def __init__(self, max_episode_steps: int = 1000):
        super().__init__("half_cheetah.xml", "mo-halfcheetah-jx-v5", max_episode_steps)
        self.observation_space = Box(low=tuple(np.full(17, -np.inf)), high=tuple(np.full(17, np.inf)))

    def _obs(self, s: PlanarState) -> jnp.ndarray:
        return jnp.concatenate([s.q[1:], s.qd]).astype(jnp.float32)

    def _mo_reward(self, s, a, vx):
        energy = -0.1 * jnp.sum(jnp.square(a))
        return jnp.stack([vx, energy]).astype(jnp.float32)

    def _terminated(self, s: PlanarState) -> jnp.ndarray:
        return jnp.bool_(False)


def make_mo_hopper_jx(max_episode_steps: int = 1000) -> MOHopperJX:
    return MOHopperJX(max_episode_steps)


def make_mo_halfcheetah_jx(max_episode_steps: int = 1000) -> MOHalfCheetahJX:
    return MOHalfCheetahJX(max_episode_steps)
