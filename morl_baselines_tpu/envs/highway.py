"""mo-highway-jx — pure-JAX multi-objective highway driving.

TPU-native counterpart of MO-Gymnasium's ``mo-highway-v0`` (highway-env's
HighwayEnv with a vector reward), which the reference consumes by env id with
a FlattenObservation wrapper (launch_experiment.py:155-157) and treats as
non-terminating for model rollouts (model_based/utils.py:132).  highway-env
itself is host python; this is a simplified device-resident re-design with
the same interface and objective structure, all dynamics in jnp so thousands
of copies step under vmap:

- 4 lanes; ego uses the 5 DiscreteMetaActions (LANE_LEFT, IDLE, LANE_RIGHT,
  FASTER, SLOWER) with the canonical target speeds {20, 25, 30} m/s.
- ``n_other`` IDM-style vehicles ahead keep time-gap spacing to their leader
  (no lane changes — documented deviation from MOBIL).
- Observation: Kinematics (5 vehicles x 5 features): rows [ego, 4 nearest],
  features (presence, x, y, vx, vy); others relative to ego, normalized to
  [-1, 1] by highway-env's feature ranges (x,y: 100 m, v: 20 m/s).
- Vector reward (mo-gymnasium highway.py): [high_speed, right_lane,
  -collision] with high_speed = clip((v - 20) / (30 - 20), 0, 1),
  right_lane = lane / (n_lanes - 1), collision in {0, -1}.
- Crash terminates; 40 decisions (1 Hz policy, 4 x 0.25 s substeps) truncate.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import Box, Discrete, MOEnv, StepOut

_N_LANES = 4
_LANE_W = 4.0
_SPEEDS = np.array([20.0, 25.0, 30.0], dtype=np.float32)  # FASTER/SLOWER targets
_DT = 0.25
_SUBSTEPS = 4  # 1 Hz decisions
_DURATION = 40  # decisions per episode
_CAR_LEN = 5.0
_V_RANGE = 20.0
_XY_RANGE = 100.0
# IDM-ish spacing for the scripted traffic
_TIME_GAP = 1.5
_MIN_GAP = 10.0
_ACCEL = 3.0


class HighwayState(NamedTuple):
    ego_x: jnp.ndarray  # () f32 — longitudinal position
    ego_lane: jnp.ndarray  # () i32
    ego_v: jnp.ndarray  # () f32
    ego_speed_idx: jnp.ndarray  # () i32 index into _SPEEDS
    other_x: jnp.ndarray  # (V,) f32
    other_lane: jnp.ndarray  # (V,) i32
    other_v: jnp.ndarray  # (V,) f32
    crashed: jnp.ndarray  # () bool
    t: jnp.ndarray  # () i32 decision counter


class MOHighway(MOEnv):
    """3-objective highway: (high_speed, right_lane, collision)."""

    reward_dim = 3
    name = "mo-highway-jx-v0"

    def __init__(self, n_other: int = 10, max_episode_steps: int = _DURATION):
        self.n_other = n_other
        self.max_episode_steps = max_episode_steps
        self.observation_space = Box(low=(-1.0,) * 25, high=(1.0,) * 25)
        self.action_space = Discrete(5)

    # -------------------------------------------------------------- helpers

    def _obs(self, s: HighwayState) -> jnp.ndarray:
        dx = s.other_x - s.ego_x
        dy = (s.other_lane - s.ego_lane).astype(jnp.float32) * _LANE_W
        dvx = s.other_v - s.ego_v
        # 4 nearest by |dx| (highway-env sorts by distance)
        order = jnp.argsort(jnp.abs(dx))[:4]
        rows = jnp.stack(
            [
                jnp.ones((4,)),
                jnp.clip(dx[order] / _XY_RANGE, -1.0, 1.0),
                jnp.clip(dy[order] / _XY_RANGE, -1.0, 1.0),
                jnp.clip(dvx[order] / _V_RANGE, -1.0, 1.0),
                jnp.zeros((4,)),
            ],
            axis=1,
        )  # (4, 5)
        # ego row: absolute features (highway-env's absolute=True for row 0)
        ego_row = jnp.stack(
            [
                jnp.float32(1.0),
                jnp.clip(s.ego_x / (10.0 * _XY_RANGE), -1.0, 1.0),
                jnp.clip(s.ego_lane.astype(jnp.float32) * _LANE_W / _XY_RANGE, -1.0, 1.0),
                jnp.clip(s.ego_v / 30.0, -1.0, 1.0),
                jnp.float32(0.0),
            ]
        )
        return jnp.concatenate([ego_row[None], rows], axis=0).reshape(-1)

    def reset(self, key: jax.Array):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        V = self.n_other
        lane = jax.random.randint(k1, (), 0, _N_LANES)
        other_lane = jax.random.randint(k2, (V,), 0, _N_LANES)
        # traffic spread ahead with per-lane spacing jitter
        other_x = 30.0 + 25.0 * jnp.arange(V) + jax.random.uniform(k3, (V,), minval=-8.0, maxval=8.0)
        other_v = jax.random.uniform(k4, (V,), minval=20.0, maxval=24.0)
        state = HighwayState(
            ego_x=jnp.float32(0.0),
            ego_lane=lane,
            ego_v=jnp.float32(25.0),
            ego_speed_idx=jnp.int32(1),
            other_x=other_x.astype(jnp.float32),
            other_lane=other_lane,
            other_v=other_v,
            crashed=jnp.asarray(False),
            t=jnp.int32(0),
        )
        return state, self._obs(state)

    def step(self, state: HighwayState, action, key: jax.Array) -> StepOut:
        action = jnp.asarray(action, dtype=jnp.int32)
        s = state
        # meta-action: lane / target-speed changes applied at decision time
        lane = jnp.clip(s.ego_lane + jnp.where(action == 0, -1, 0) + jnp.where(action == 2, 1, 0), 0, _N_LANES - 1)
        sp_idx = jnp.clip(s.ego_speed_idx + jnp.where(action == 3, 1, 0) + jnp.where(action == 4, -1, 0), 0, 2)
        target_v = jnp.asarray(_SPEEDS)[sp_idx]

        ego_x, ego_v = s.ego_x, s.ego_v
        other_x, other_v = s.other_x, s.other_v
        crashed = s.crashed
        for _ in range(_SUBSTEPS):  # static unroll
            # ego tracks its target speed
            ego_v = ego_v + jnp.clip(target_v - ego_v, -_ACCEL * _DT, _ACCEL * _DT)
            ego_x = ego_x + ego_v * _DT
            # scripted traffic: same-lane leader gap control (IDM-flavoured)
            dx_all = other_x[None, :] - other_x[:, None]  # leader offsets
            same_lane = (other_lane_eq := s.other_lane[None, :] == s.other_lane[:, None]) & (dx_all > 0)
            lead_gap = jnp.min(jnp.where(same_lane, dx_all, jnp.inf), axis=1)
            desired = _MIN_GAP + _TIME_GAP * other_v
            decel = jnp.where(lead_gap < desired, -_ACCEL, 0.5)
            other_v = jnp.clip(other_v + decel * _DT, 15.0, 25.0)
            other_x = other_x + other_v * _DT
            # collision: same lane as ego and bumper overlap
            hit = (s.other_lane == lane) & (jnp.abs(other_x - ego_x) < _CAR_LEN)
            crashed = crashed | jnp.any(hit)

        t = s.t + 1
        new_state = HighwayState(ego_x, lane, ego_v, sp_idx, other_x, s.other_lane, other_v, crashed, t)
        high_speed = jnp.clip((ego_v - 20.0) / 10.0, 0.0, 1.0)
        right_lane = lane.astype(jnp.float32) / (_N_LANES - 1)
        collision = -crashed.astype(jnp.float32)
        reward = jnp.stack([high_speed, right_lane, collision])
        terminated = crashed
        truncated = t >= self.max_episode_steps
        return StepOut(new_state, self._obs(new_state), reward, terminated, truncated)
