"""MO Lunar Lander (discrete + continuous) — pure-JAX rigid-body dynamics.

Behavioral counterpart of MO-Gymnasium's ``mo-lunar-lander-v3`` /
``mo-lunar-lander-continuous-v3`` (the reference's MORL/D showcase env,
reference examples/morld_lunar_lander.py:10 and
examples/morld_lunar_lander_restore.py:10; ref point [-101,-1001,-101,-101]).
The 4-objective reward decomposes the classic scalar LunarLander reward into

    r = [ landed (+100 stable rest / -100 crash, else 0),
          shaped reward (potential difference of distance/speed/tilt/contacts),
          main-engine fuel  (-0.30 * m_power),
          side-engine fuel  (-0.03 * s_power) ]

whose sum equals the classic single-objective reward, matching the MO
decomposition the reference trains against.

The upstream env integrates a Box2D world.  Box2D is a host-side C library
with data-dependent contact solving — unusable inside a jitted program — so
this module re-derives the dynamics as a branch-free planar rigid body
(explicit symplectic-Euler with substeps, spring-damper leg contacts on flat
helipad terrain).  Observation layout, engine powers/offsets, shaping
potential, termination rules, and reward decomposition follow the upstream
env; terrain is flat at helipad height and leg joints are rigid (documented
deviations).  Thousands of landers integrate under vmap on the VPU with zero
host round-trips.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .base import Box, Discrete, MOEnv, StepOut

# Box2D-world constants from the upstream env (pixels / SCALE = meters).
FPS = 50.0
SCALE = 30.0
W = 600.0 / SCALE  # world width  (20 m)
H = 400.0 / SCALE  # world height (13.33 m)
HELIPAD_Y = H / 4.0
MAIN_ENGINE_POWER = 13.0
SIDE_ENGINE_POWER = 0.6
SIDE_ENGINE_HEIGHT = 14.0 / SCALE
SIDE_ENGINE_AWAY = 12.0 / SCALE
LEG_AWAY = 20.0 / SCALE
LEG_DOWN = 18.0 / SCALE
INITIAL_RANDOM = 1000.0
GRAVITY = -10.0

# Rigid-body constants: mass/inertia of the upstream lander polygon
# (hexagon area 867 px^2 at density 5.0 -> 4.817 kg; legs ~0.07 each).
MASS = 4.96
INERTIA = 0.84
DT = 1.0 / FPS
SUBSTEPS = 8
# Leg tips in body frame (hip at +/-LEG_AWAY, leg hangs ~0.4 rad outward).
LEG_TIP_X = LEG_AWAY + 0.25
LEG_TIP_Y = -(LEG_DOWN + 0.45)
BODY_BOTTOM = -10.0 / SCALE
# Spring-damper ground contact (penalty method; Box2D solves an LCP instead).
# Tangential friction is viscous with a Coulomb cap — the regularized model
# that stays stable under explicit substepping (no stick-slip limit cycles).
CONTACT_K = 1500.0
CONTACT_C = 120.0
FRICTION_C = 40.0
FRICTION_MU = 1.5


class LLState(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    vx: jnp.ndarray
    vy: jnp.ndarray
    angle: jnp.ndarray
    omega: jnp.ndarray
    prev_shaping: jnp.ndarray
    t: jnp.ndarray


def _leg_contacts(x, y, angle):
    """Ground-penetration depth of each leg tip (flat terrain at HELIPAD_Y)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    depths = []
    for sx in (-1.0, 1.0):
        bx, by = sx * LEG_TIP_X, LEG_TIP_Y
        wy = y + s * bx + c * by
        depths.append(HELIPAD_Y - wy)
    return depths[0], depths[1]  # >0 means penetrating


class _LunarLanderBase(MOEnv):
    reward_dim = 4

    def __init__(self, max_episode_steps: int = 1000):
        self.max_episode_steps = max_episode_steps
        self.observation_space = Box(
            low=(-2.5, -2.5, -10.0, -10.0, -6.2831855, -10.0, 0.0, 0.0),
            high=(2.5, 2.5, 10.0, 10.0, 6.2831855, 10.0, 1.0, 1.0),
        )

    def _obs(self, s: LLState) -> jnp.ndarray:
        d_l, d_r = _leg_contacts(s.x, s.y, s.angle)
        return jnp.stack(
            [
                (s.x - W / 2.0) / (W / 2.0),
                (s.y - (HELIPAD_Y + LEG_DOWN)) / (H / 2.0),
                s.vx * (W / 2.0) / FPS,
                s.vy * (H / 2.0) / FPS,
                s.angle,
                20.0 * s.omega / FPS,
                (d_l > 0.0).astype(jnp.float32),
                (d_r > 0.0).astype(jnp.float32),
            ]
        ).astype(jnp.float32)

    def _shaping(self, obs: jnp.ndarray) -> jnp.ndarray:
        return (
            -100.0 * jnp.sqrt(obs[0] ** 2 + obs[1] ** 2)
            - 100.0 * jnp.sqrt(obs[2] ** 2 + obs[3] ** 2)
            - 100.0 * jnp.abs(obs[4])
            + 10.0 * obs[6]
            + 10.0 * obs[7]
        )

    def reset(self, key: jax.Array):
        # Upstream applies a uniform +/-INITIAL_RANDOM force to the center for
        # the first world step: dv = F*dt/m.
        fkey = jax.random.uniform(key, (2,), minval=-INITIAL_RANDOM, maxval=INITIAL_RANDOM)
        s = LLState(
            x=jnp.float32(W / 2.0),
            # upstream spawns at initial_y = VIEWPORT_H/SCALE (= H)
            y=jnp.float32(H),
            vx=fkey[0] * DT / MASS,
            vy=fkey[1] * DT / MASS,
            angle=jnp.float32(0.0),
            omega=jnp.float32(0.0),
            prev_shaping=jnp.float32(0.0),
            t=jnp.int32(0),
        )
        obs = self._obs(s)
        s = s._replace(prev_shaping=self._shaping(obs))
        return s, obs

    def _step_physics(self, state: LLState, m_power, s_dir, s_power, key):
        """One env step: engine impulses + SUBSTEPS of contact integration."""
        kd = jax.random.uniform(key, (2,), minval=-1.0, maxval=1.0) / SCALE
        c, s = jnp.cos(state.angle), jnp.sin(state.angle)
        # body-frame "up" axis in world coords: tip=(s, c); lateral: (-c, s)
        tip_x, tip_y = s, c
        side_x, side_y = -c, s

        # main engine: impulse opposite the nozzle offset (upstream step math)
        ox = tip_x * (4.0 / SCALE + 2.0 * kd[0]) + side_x * kd[1]
        oy = -tip_y * (4.0 / SCALE + 2.0 * kd[0]) - side_y * kd[1]
        imp_mx = -ox * MAIN_ENGINE_POWER * m_power
        imp_my = -oy * MAIN_ENGINE_POWER * m_power
        # torque from the impulse applied at (ox, oy) off-center: r x J
        tau_m = ox * imp_my - oy * imp_mx

        # side engine: impulse at the side nozzle, SIDE_ENGINE_HEIGHT up
        sox = tip_x * kd[0] + side_x * (3.0 * kd[1] + s_dir * SIDE_ENGINE_AWAY)
        soy = -tip_y * kd[0] - side_y * (3.0 * kd[1] + s_dir * SIDE_ENGINE_AWAY)
        imp_sx = -sox * SIDE_ENGINE_POWER * s_power
        imp_sy = -soy * SIDE_ENGINE_POWER * s_power
        rx = sox - tip_x * 17.0 / SCALE
        ry = soy + tip_y * SIDE_ENGINE_HEIGHT
        tau_s = rx * imp_sy - ry * imp_sx

        vx = state.vx + (imp_mx + imp_sx) / MASS
        vy = state.vy + (imp_my + imp_sy) / MASS
        omega = state.omega + (tau_m + tau_s) / INERTIA
        x, y, angle = state.x, state.y, state.angle

        h = DT / SUBSTEPS
        leg_bx = jnp.array([-LEG_TIP_X, LEG_TIP_X])  # both legs vectorized

        def substep(_, c):
            # leg spring-damper contacts (both legs, branch-free) — a
            # lax.fori_loop so the contact block compiles ONCE, not SUBSTEPS
            # inlined copies (the unrolled version made every scan over this
            # env a multi-minute XLA:CPU compile)
            x, y, vx, vy, angle, omega = c
            ca, sa = jnp.cos(angle), jnp.sin(angle)
            rwx = ca * leg_bx - sa * LEG_TIP_Y
            rwy = sa * leg_bx + ca * LEG_TIP_Y
            pen = jnp.maximum(HELIPAD_Y - (y + rwy), 0.0)
            tip_vy = vy + omega * rwx
            tip_vx = vx - omega * rwy
            fn = CONTACT_K * pen - CONTACT_C * tip_vy * (pen > 0.0)
            fn = jnp.maximum(fn, 0.0) * (pen > 0.0)
            ft = jnp.clip(-FRICTION_C * tip_vx, -FRICTION_MU * fn, FRICTION_MU * fn)
            fx_c = jnp.sum(ft)
            fy_c = jnp.sum(fn)
            tau_c = jnp.sum(rwx * fn - rwy * ft)
            vx = vx + h * fx_c / MASS
            vy = vy + h * (GRAVITY + fy_c / MASS)
            omega = omega + h * tau_c / INERTIA
            omega = omega * (1.0 - 0.05 * h)  # Box2D angular damping analog
            return (x + h * vx, y + h * vy, vx, vy, angle + h * omega, omega)

        x, y, vx, vy, angle, omega = jax.lax.fori_loop(
            0, SUBSTEPS, substep, (x, y, vx, vy, angle, omega)
        )
        return LLState(x, y, vx, vy, angle, omega, state.prev_shaping, state.t + 1)

    def _finish(self, state: LLState, m_power, s_power) -> StepOut:
        obs = self._obs(state)
        shaping = self._shaping(obs)
        shaped = shaping - state.prev_shaping
        state = state._replace(prev_shaping=shaping)

        # crash: body bottom under terrain, flown out of the viewport, or a leg
        # driven deep into the ground (hard impact the penalty contact would
        # otherwise bounce; Box2D would slam the body into the terrain)
        bottom_y = state.y + jnp.cos(state.angle) * BODY_BOTTOM
        d_l, d_r = _leg_contacts(state.x, state.y, state.angle)
        crashed = (
            (bottom_y < HELIPAD_Y - 0.02)
            | (jnp.abs(obs[0]) >= 1.0)
            | (jnp.maximum(d_l, d_r) > 0.15)
        )
        # landed: at rest with both legs down (upstream: body not awake)
        speed = jnp.sqrt(state.vx**2 + state.vy**2)
        landed = (
            (obs[6] > 0.0)
            & (obs[7] > 0.0)
            & (speed < 0.05)
            & (jnp.abs(state.omega) < 0.05)
            & jnp.logical_not(crashed)
        )
        terminated = crashed | landed
        # upstream REPLACES the reward with +/-100 on the terminal step, so the
        # shaping and fuel components are zeroed there to keep sum-parity
        reward = jnp.stack(
            [
                jnp.where(crashed, -100.0, jnp.where(landed, 100.0, 0.0)),
                jnp.where(terminated, 0.0, shaped),
                jnp.where(terminated, 0.0, -0.30 * m_power),
                jnp.where(terminated, 0.0, -0.03 * s_power),
            ]
        ).astype(jnp.float32)
        return StepOut(state, obs, reward, terminated, state.t >= self.max_episode_steps)

    def render_frame(self, state: LLState, width: int = 400, height: int = 267):
        return _render_lander(state, width, height)


class MOLunarLander(_LunarLanderBase):
    """Discrete actions: 0 noop, 1 left engine, 2 main, 3 right."""

    name = "mo-lunar-lander-v3"

    def __init__(self, max_episode_steps: int = 1000):
        super().__init__(max_episode_steps)
        self.action_space = Discrete(4)

    def step(self, state: LLState, action: jnp.ndarray, key: jax.Array) -> StepOut:
        action = jnp.asarray(action, dtype=jnp.int32)
        m_power = (action == 2).astype(jnp.float32)
        s_dir = jnp.where(action == 1, -1.0, jnp.where(action == 3, 1.0, 0.0))
        s_power = (s_dir != 0.0).astype(jnp.float32)
        state = self._step_physics(state, m_power, s_dir, s_power, key)
        return self._finish(state, m_power, s_power)


class MOLunarLanderContinuous(_LunarLanderBase):
    """Continuous 2-D action: [main throttle, lateral thrust], both in [-1, 1]."""

    name = "mo-lunar-lander-continuous-v3"

    def __init__(self, max_episode_steps: int = 1000):
        super().__init__(max_episode_steps)
        self.action_space = Box(low=(-1.0, -1.0), high=(1.0, 1.0))

    def step(self, state: LLState, action: jnp.ndarray, key: jax.Array) -> StepOut:
        a = jnp.clip(jnp.asarray(action, dtype=jnp.float32).reshape(2), -1.0, 1.0)
        # upstream throttle law: main fires above 0 at 50-100% power,
        # side fires when |lateral| > 0.5 at 50-100% power
        main_on = a[0] > 0.0
        m_power = jnp.where(main_on, jnp.clip(a[0], 0.0, 1.0) * 0.5 + 0.5, 0.0)
        side_on = jnp.abs(a[1]) > 0.5
        s_dir = jnp.sign(a[1]) * side_on
        s_power = jnp.where(side_on, jnp.clip(jnp.abs(a[1]), 0.5, 1.0), 0.0)
        state = self._step_physics(state, m_power, s_dir, s_power, key)
        return self._finish(state, m_power, s_power)


def _render_lander(state: LLState, width: int = 400, height: int = 267) -> "object":
    """(H, W, 3) uint8 frame (host-side, visualization only)."""
    import numpy as np

    img = np.zeros((height, width, 3), dtype=np.uint8)
    img[:] = (10, 10, 30)  # sky
    sx, sy = width / W, height / H

    def to_px(wx, wy):
        return int(wx * sx), int(height - 1 - wy * sy)

    gy = to_px(0.0, HELIPAD_Y)[1]
    img[gy:, :] = (120, 110, 100)  # terrain
    x, y = float(np.asarray(state.x)), float(np.asarray(state.y))
    ang = float(np.asarray(state.angle))
    c, s = np.cos(ang), np.sin(ang)
    # lander body quad + leg tips in world coords
    body = [(-0.55, 0.55), (0.55, 0.55), (0.55, BODY_BOTTOM), (-0.55, BODY_BOTTOM)]
    pts = [(x + c * bx - s * by, y + s * bx + c * by) for bx, by in body]
    xs = [to_px(px, py)[0] for px, py in pts]
    ys = [to_px(px, py)[1] for px, py in pts]
    x0, x1 = max(0, min(xs)), min(width - 1, max(xs))
    y0, y1 = max(0, min(ys)), min(height - 1, max(ys))
    if x0 <= x1 and y0 <= y1:
        img[y0 : y1 + 1, x0 : x1 + 1] = (200, 200, 220)
    for lsx in (-1.0, 1.0):
        lx = x + c * lsx * LEG_TIP_X - s * LEG_TIP_Y
        ly = y + s * lsx * LEG_TIP_X + c * LEG_TIP_Y
        px, py = to_px(lx, ly)
        if 0 <= px < width - 2 and 0 <= py < height - 2:
            img[py : py + 3, px : px + 3] = (220, 120, 40)
    return img


