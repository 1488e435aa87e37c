"""IPRO — Iterated Pareto Referent Optimisation (outer loop + 2D/nD variants).

TPU-native re-design of reference multi_policy/ipro/outer_loop.py:29-461,
ipro.py:23-333, ipro_2d.py:24-269 and box.py:6-133 (Röpke et al.):

- AASF utility u(v) = min((v - referent) / (ideal - nadir)) * scale + aug *
  mean(...) (reference outer_loop.py:47-51) — here a pure jnp closure, so the
  inner oracle (our jitted NLMOPPO) gets exact ∂u/∂v by jax.grad.
- Init phase trains per-objective linear scalarizations to estimate the
  extrema -> nadir/ideal with offset (reference ipro.py init_phase :146-210).
- IPRO (n-D): the reference's real referent machinery — a LOWER point set
  (maximal corners of the undominated region, init {nadir}) and an UPPER
  point set (init {ideal}) maintained by the d-way staircase shift
  (reference update_lower_points/update_upper_points ipro.py:244-270);
  referent selection by HYPERVOLUME IMPROVEMENT over the lower points
  (compute_hvis/select_referent :212-242); failed referents accumulate in a
  ``completed`` set; a found point that retro-dominates earlier accepted
  points triggers the REPLAY mechanism which rebuilds the state from the
  subsolution history (reference outer_loop.py:313-356).
- IPRO-2D: bi-objective specialization with a queue of boxes split at each
  found point (reference ipro_2d.py:149-267).

The outer loop is host-side numpy by design: it runs once per ~50k-step
oracle call (SURVEY §7 keeps episodic outer loops on host); the oracle and
its utility gradients are the jitted TPU path.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.indicators import hypervolume
from ..core.pareto import filter_pareto_dominated, strict_pareto_dominates
from ..envs.base import MOEnv
from .base import MOAgentBase
from .nlmoppo import NLMOPPO, NLMOPPOConfig


def _strict_dom(a: np.ndarray, b: np.ndarray) -> bool:
    """a strictly dominates b: a > b in every coordinate (reference pareto.py:24)."""
    return bool(np.all(np.asarray(a) > np.asarray(b)))


def _batched_strict_dom(a: np.ndarray, pts: np.ndarray) -> np.ndarray:
    if len(pts) == 0:
        return np.zeros((0,), dtype=bool)
    return np.all(np.asarray(a)[None, :] > np.asarray(pts), axis=-1)


class Box:
    """Axis-aligned box [nadir, ideal] (reference box.py:6-133)."""

    def __init__(self, nadir: np.ndarray, ideal: np.ndarray):
        self.nadir = np.asarray(nadir, dtype=np.float64)
        self.ideal = np.asarray(ideal, dtype=np.float64)

    @property
    def volume(self) -> float:
        return float(np.prod(np.maximum(self.ideal - self.nadir, 0.0)))

    @property
    def max_dist(self) -> float:
        return float(np.max(np.maximum(self.ideal - self.nadir, 0.0)))

    def __repr__(self):
        return f"Box({self.nadir}, {self.ideal})"


def make_aasf(referent, nadir, ideal, aug: float = 0.1, scale: float = 100.0):
    """AASF closure over jnp (reference outer_loop.py:47-51)."""
    referent = jnp.asarray(referent, dtype=jnp.float32)
    pos = jnp.asarray(ideal, dtype=jnp.float32) - jnp.asarray(nadir, dtype=jnp.float32)

    def u(v):
        frac = scale * (v - referent) / pos
        return jnp.min(frac, axis=-1) + aug * jnp.mean(frac, axis=-1)

    return u


def make_linear_u(weights):
    w = jnp.asarray(weights, dtype=jnp.float32)

    def u(v):
        return jnp.sum(v * w, axis=-1)

    return u


@dataclass
class IPROConfig:
    offset: float = 1.0
    tolerance: float = 1e-2
    max_iterations: Optional[int] = 20
    update_freq: int = 1  # iterations between HVI recomputes (reference ipro.py:72)
    hvi_samples: int = 50  # lower points scored per HVI recompute (reference :214)
    aug: float = 0.1
    scale: float = 100.0
    iter_total_timesteps: int = 50_000
    reset_agent: bool = False
    ppo: NLMOPPOConfig = field(default_factory=NLMOPPOConfig)
    seed: int = 0


class _IPROBase(MOAgentBase):
    """Shared init-phase + oracle plumbing for the 2-D and n-D outer loops."""

    def __init__(self, env: MOEnv, config: IPROConfig = IPROConfig(), log: bool = False):
        super().__init__(env, config, log=log)
        self.cfg = config
        self.agent = NLMOPPO(env, config.ppo)
        self.pf: List[np.ndarray] = []
        self.total_hv = 0.0
        self.dominated_hv = 0.0
        self.discarded_hv = 0.0
        self.coverage = 0.0

    def init_phase(self, state):
        """Train per-objective linear scalarizations for the extrema
        (reference ipro.py:146-210; the reference also trains the minimising
        problems for a pessimistic nadir — the offset plays that role here)."""
        cfg = self.cfg
        extrema = []
        for k in range(self.reward_dim):
            u = make_linear_u(np.eye(self.reward_dim)[k])
            state, point = self.agent.train(cfg.iter_total_timesteps, u, state=state)
            extrema.append(point)
            self.pf.append(point)
        extrema = np.asarray(extrema)
        self.nadir = extrema.min(axis=0) - cfg.offset
        self.ideal = extrema.max(axis=0) + cfg.offset
        self.pf = list(filter_pareto_dominated(np.asarray(self.pf)))
        self.total_hv = Box(self.nadir, self.ideal).volume
        return state

    def _oracle(self, state, referent, iteration):
        """One AASF subproblem (reference oracle_train outer_loop.py:377-395)."""
        cfg = self.cfg
        u = make_aasf(referent, self.nadir, self.ideal, cfg.aug, cfg.scale)
        if cfg.reset_agent:
            state = self.agent.init_state(jax.random.key(cfg.seed + iteration + 1))
        return self.agent.train(cfg.iter_total_timesteps, u, state=state)


class IPRO(_IPROBase):
    """n-D IPRO with the reference's lower/upper point sets, HVI referent
    selection, completed-set bookkeeping and replay (reference ipro.py:23-333)."""

    def __init__(self, env: MOEnv, config: IPROConfig = IPROConfig(), log: bool = False):
        super().__init__(env, config, log=log)
        d = env.reward_dim
        self.lower_points = np.empty((0, d))
        self.upper_points = np.empty((0, d))
        self.completed = np.empty((0, d))
        self.robust_points = np.empty((0, d))
        self.error = np.inf
        self.replay_triggered = 0
        self._rng = np.random.default_rng(config.seed)

    # -------------------------------------------------------- point-set algebra
    #
    # Both staircase sets evolve by the same local rule: a corner "hit" by a
    # new point spawns one child per objective, where child i keeps every
    # coordinate of the corner except the i-th, which moves to the new
    # point's value.  We express that child set as an eye-mask select per
    # corner and prune with a sign-parametrized extreme filter — same
    # semantics as the reference's update_lower_points/update_upper_points
    # (ipro.py:244-270), own formulation.

    def _corner_children(self, corner: np.ndarray, vec: np.ndarray) -> np.ndarray:
        """(d, d) children of one staircase corner: row i takes vec_i at
        coordinate i and the corner's value elsewhere."""
        take_vec = np.eye(self.reward_dim, dtype=bool)
        return np.where(take_vec, np.asarray(vec)[None, :], np.asarray(corner)[None, :])

    @staticmethod
    def _keep_extremes(points: np.ndarray, sign: float) -> np.ndarray:
        """Prune a staircase set to its extreme corners: sign=+1 keeps the
        Pareto-maximal points (upper set), sign=-1 the minimal ones (lower)."""
        pts = np.asarray(points, dtype=np.float64).reshape(-1, points.shape[-1])
        return sign * filter_pareto_dominated(sign * pts)

    def update_lower_points(self, vec: np.ndarray) -> None:
        """Lower-staircase update: corners strictly dominated by ``vec`` are
        replaced by their children, kept only while strictly below the ideal."""
        dom = _batched_strict_dom(vec, self.lower_points)
        pieces = [self.lower_points[~dom]]
        for corner in self.lower_points[dom]:
            children = self._corner_children(corner, vec)
            pieces.append(children[np.all(children < self.ideal[None, :], axis=-1)])
        self.lower_points = self._keep_extremes(np.vstack(pieces), -1.0)

    def update_upper_points(self, vec: np.ndarray) -> None:
        """Upper-staircase update: corners strictly dominating ``vec`` are
        replaced by their children, kept only while strictly above the nadir."""
        up = self.upper_points
        dom = (
            np.all(up > np.asarray(vec)[None, :], axis=-1) if len(up) else np.zeros((0,), bool)
        )
        pieces = [up[~dom]]
        for corner in up[dom]:
            children = self._corner_children(corner, vec)
            pieces.append(children[np.all(children > self.nadir[None, :], axis=-1)])
        self.upper_points = self._keep_extremes(np.vstack(pieces), 1.0)

    # ----------------------------------------------------- referent selection

    def _hv_to_ideal(self, points: np.ndarray) -> float:
        """Volume between ``points`` and the ideal (minimisation-form HV,
        reference compute_hypervolume outer_loop.py:249-255): negate into the
        maximisation form our host WFG kernel expects."""
        points = np.asarray(points, dtype=np.float64)
        points = points[np.all(points <= self.ideal, axis=-1)]
        if points.size == 0:
            return 0.0
        return float(hypervolume(-points, -self.ideal))

    def compute_hvis(self, num: int | None = None) -> None:
        """Order the lower points so the most promising referent comes first
        (reference ipro.py:212-229 scores HV of pf ∪ completed ∪ {lp} w.r.t.
        the ideal).  Only a random subsample of at most ``hvi_samples``
        candidates is scored; unscored points keep score 0 and sort last."""
        num = num or self.cfg.hvi_samples
        n = len(self.lower_points)
        if n == 0:
            return
        anchors = np.vstack([np.asarray(self.pf).reshape(-1, self.reward_dim), self.completed])
        scores = np.zeros(n)
        for i in self._rng.permutation(n)[:num]:
            scores[i] = self._hv_to_ideal(np.vstack((anchors, self.lower_points[i][None])))
        self.lower_points = self.lower_points[np.argsort(-scores, kind="stable")]

    def select_referent(self, method: str = "first") -> np.ndarray:
        """Best lower point by HVI (reference select_referent ipro.py:237-242)."""
        if method == "random":
            return self.lower_points[self._rng.integers(0, len(self.lower_points))]
        return self.lower_points[0]

    # ------------------------------------------------------------ state updates

    def update_found(self, referent: np.ndarray, vec: np.ndarray) -> None:
        """A point strictly dominating its referent joins the front and
        reshapes both staircases (reference ipro.py:306-311)."""
        self.pf = list(filter_pareto_dominated(np.vstack((np.asarray(self.pf).reshape(-1, self.reward_dim), vec[None]))))
        self.update_lower_points(vec)
        self.update_upper_points(vec)

    def update_not_found(self, referent: np.ndarray, vec: np.ndarray) -> None:
        """A failed referent is completed: removed from the lower set, its
        region written off via the upper set (reference ipro.py:313-320)."""
        self.completed = np.vstack((self.completed, referent[None]))
        keep = np.any(self.lower_points != referent[None], axis=1)
        self.lower_points = self.lower_points[keep]
        self.update_upper_points(referent)
        if _strict_dom(vec, self.nadir):
            self.robust_points = np.vstack((self.robust_points, vec[None]))

    def update_excluded_volume(self) -> None:
        """dominated = HV(pf) above the nadir; discarded = volume between
        pf ∪ completed and the ideal (reference ipro.py:329-333)."""
        pf = np.asarray(self.pf).reshape(-1, self.reward_dim)
        above = pf[np.all(pf >= self.nadir, axis=-1)]
        self.dominated_hv = float(hypervolume(above, self.nadir)) if len(above) else 0.0
        self.discarded_hv = self._hv_to_ideal(np.vstack((pf, self.completed)))

    def estimate_error(self) -> None:
        """Max over upper points of the min Chebyshev gap to the front
        (reference estimate_error ipro.py:231-239)."""
        if len(self.upper_points) == 0 or len(self.pf) == 0:
            self.error = 0.0
            return
        pf = np.asarray(self.pf).reshape(-1, self.reward_dim)
        diffs = self.upper_points[:, None, :] - pf[None, :, :]
        self.error = float(np.max(np.min(np.max(diffs, axis=2), axis=1)))

    # ------------------------------------------------------------------ replay

    def _reset_sets(self) -> None:
        """Re-seed the point sets from the stored extrema (reference reset +
        init_phase(extrema=...) ipro.py:140-144,205-210 — we additionally keep
        the init-phase extrema points in the front, which the reference's
        replay path drops as a side effect of its reset)."""
        d = self.reward_dim
        self.pf = list(self._init_pf)
        self.completed = np.empty((0, d))
        self.robust_points = np.empty((0, d))
        self.lower_points = self.nadir[None].copy()
        for p in self.pf:
            self.update_lower_points(np.asarray(p))
        self.upper_points = self.ideal[None].copy()
        self.dominated_hv = 0.0
        self.discarded_hv = 0.0

    def replay(self, vec: np.ndarray, subsolutions: list) -> list:
        """Rebuild the outer-loop state when a new point retro-dominates
        earlier accepted points or completed referents (reference
        outer_loop.py:313-356): re-apply the subsolution history, substituting
        ``vec`` at the first step it improves, then re-admit the tail against
        the rebuilt lower set."""
        self.replay_triggered += 1
        self._reset_sets()
        new_subs: list = []
        idx = 0
        inserted = False
        for referent, old_vec in subsolutions:
            idx += 1
            if _strict_dom(old_vec, referent):
                if _strict_dom(vec, old_vec):
                    self.update_found(referent, vec)
                    new_subs.append((referent, vec))
                    inserted = True
                    break
                self.update_found(referent, old_vec)
                new_subs.append((referent, old_vec))
            else:
                if _strict_dom(vec, referent):
                    self.update_found(referent, vec)
                    new_subs.append((referent, vec))
                    inserted = True
                    break
                self.update_not_found(referent, old_vec)
                new_subs.append((referent, old_vec))
        for referent, old_vec in subsolutions[idx:]:
            # re-admit remaining history against the rebuilt lower set
            for lower in np.copy(self.lower_points):
                if _strict_dom(old_vec, referent):
                    if _strict_dom(old_vec, lower):
                        self.update_found(lower, old_vec)
                        new_subs.append((lower, old_vec))
                        break
                else:
                    # WEAK dominance: the rebuilt lower point commonly equals
                    # the original referent exactly, and the completed
                    # referent must not drop out of the volume accounting
                    # then (reference maybe_add_completed ipro.py:294-304;
                    # r4 advisor finding)
                    if np.all(np.asarray(lower) >= np.asarray(referent)):
                        self.update_not_found(lower, old_vec)
                        new_subs.append((lower, old_vec))
                        break
        if not inserted and len(subsolutions) > 0 and len(self.lower_points) > 0:
            # vec belongs at the end of the history (empty lower set = full
            # coverage, nothing left to attribute it to — r4 advisor finding)
            ref0 = self.select_referent()
            if _strict_dom(vec, ref0):
                self.update_found(ref0, vec)
                new_subs.append((ref0, vec))
        return new_subs

    # ------------------------------------------------------------------- train

    def train(self, total_timesteps: int | None = None, eval_env=None, ref_point=None, known_pareto_front=None):
        """Run IPRO; returns the Pareto front (reference solve loop
        outer_loop.py:397-461)."""
        cfg = self.cfg
        state = self.agent.init_state(jax.random.key(cfg.seed))
        state = self.init_phase(state)
        self._init_pf = [np.asarray(p) for p in self.pf]
        self.lower_points = self.nadir[None].copy()
        for p in self.pf:
            self.update_lower_points(np.asarray(p))
        self.upper_points = self.ideal[None].copy()
        self.error = float(np.max(self.ideal - self.nadir))
        self.compute_hvis()

        subsolutions: list = []
        iteration = 0
        max_iter = cfg.max_iterations or np.inf
        while (
            len(self.lower_points) > 0
            and iteration < max_iter
            and (1.0 - self.coverage) > cfg.tolerance
        ):
            if iteration % cfg.update_freq == 0:
                self.compute_hvis()
            referent = self.select_referent()
            state, point = self._oracle(state, referent, iteration)
            point = np.asarray(point)
            pf_arr = np.asarray(self.pf).reshape(-1, self.reward_dim)
            if _strict_dom(point, referent):
                if np.any(_batched_strict_dom(point, np.vstack((pf_arr, self.completed)))):
                    subsolutions = self.replay(point, subsolutions)
                else:
                    self.update_found(referent, point)
                    subsolutions.append((referent, point))
            else:
                if np.any(_batched_strict_dom(point, self.completed)):
                    subsolutions = self.replay(point, subsolutions)
                else:
                    self.update_not_found(referent, point)
                    subsolutions.append((referent, point))
            self.update_excluded_volume()
            self.estimate_error()
            self.coverage = (self.dominated_hv + self.discarded_hv) / max(self.total_hv, 1e-12)
            iteration += 1
            self.logger.log(
                {
                    "outer/coverage": self.coverage,
                    "outer/error": self.error,
                    "outer/pf_size": len(self.pf),
                    "outer/lower_points": len(self.lower_points),
                    "outer/replay_triggered": self.replay_triggered,
                },
                iteration,
            )
        # robust points fold into the final front (reference finish :199-205)
        final = np.vstack((np.asarray(self.pf).reshape(-1, self.reward_dim), self.robust_points))
        self.pf = list(filter_pareto_dominated(final))
        self._state = state
        return self.pf


class IPRO2D(_IPROBase):
    """Bi-objective specialization: a queue of boxes ordered by volume,
    split at each found point (reference ipro_2d.py:24-269)."""

    def __init__(self, env: MOEnv, config: IPROConfig = IPROConfig(), log: bool = False):
        assert env.reward_dim == 2, "IPRO2D requires exactly 2 objectives"
        super().__init__(env, config, log=log)
        self.box_queue: List[Box] = []

    def _split_box(self, box: Box, point: np.ndarray) -> List[Box]:
        """Split at an interior point; accumulate dominated/discarded volume
        (reference ipro_2d.py:149-210)."""
        p = np.clip(point, box.nadir, box.ideal)
        self.dominated_hv += Box(box.nadir, p).volume
        self.discarded_hv += Box(p, box.ideal).volume
        boxes = [
            Box(np.array([box.nadir[0], p[1]]), np.array([p[0], box.ideal[1]])),
            Box(np.array([p[0], box.nadir[1]]), np.array([box.ideal[0], p[1]])),
        ]
        return [b for b in boxes if b.volume > self.cfg.tolerance and np.all(b.ideal > b.nadir)]

    def _push_boxes(self, boxes: List[Box]) -> None:
        self.box_queue.extend(boxes)
        self.box_queue.sort(key=lambda b: b.volume)

    def train(self, total_timesteps: int | None = None, eval_env=None, ref_point=None, known_pareto_front=None):
        """Run IPRO-2D; returns the Pareto front."""
        cfg = self.cfg
        state = self.agent.init_state(jax.random.key(cfg.seed))
        state = self.init_phase(state)
        self._push_boxes([Box(self.nadir, self.ideal)])
        iteration = 0
        max_iter = cfg.max_iterations or np.inf
        while self.box_queue and iteration < max_iter and (1.0 - self.coverage) > cfg.tolerance:
            box = self.box_queue.pop()  # largest volume
            referent = box.nadir
            state, point = self._oracle(state, referent, iteration)
            if bool(strict_pareto_dominates(jnp.asarray(point), jnp.asarray(referent))):
                # the new point may also dominate other open boxes' nadirs —
                # split those too (the 2-D analog of the replay mechanism)
                self._push_boxes(self._split_box(box, point))
                self.pf.append(point)
                remaining = []
                for ob in self.box_queue:
                    if bool(
                        strict_pareto_dominates(jnp.asarray(point), jnp.asarray(ob.nadir))
                    ) and np.all(point < ob.ideal):
                        remaining.extend(self._split_box(ob, point))
                    else:
                        remaining.append(ob)
                self.box_queue = remaining
                self.box_queue.sort(key=lambda b: b.volume)
            else:
                # failed subproblem: the box volume is written off as discarded
                self.discarded_hv += box.volume
            self.coverage = (self.dominated_hv + self.discarded_hv) / max(self.total_hv, 1e-12)
            iteration += 1
            self.pf = list(filter_pareto_dominated(np.asarray(self.pf)))
            self.logger.log(
                {
                    "outer/coverage": self.coverage,
                    "outer/pf_size": len(self.pf),
                    "outer/open_boxes": len(self.box_queue),
                },
                iteration,
            )
        self._state = state
        return self.pf
