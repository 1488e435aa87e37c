"""Episodic replay for PCN/LCN — fixed-capacity episodes ranked for commands.

TPU-native counterpart of PCN's heap of episodes ranked by
distance-to-front + crowding penalty (reference multi_policy/pcn/pcn.py:
Transition list :324-349 and ``_nlargest`` :250-279).  Variable-length
episodes become (max_episodes, max_len, ...) arrays with a length vector;
ranking/eviction is a device top-k over a score computed exactly like the
reference: negative distance of each episode's return to the current
non-dominated set, minus a crowding-distance tie-breaker.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class EpisodeBatch(NamedTuple):
    obs: jnp.ndarray  # (E, T, obs_dim)
    action: jnp.ndarray  # (E, T)
    reward: jnp.ndarray  # (E, T, d)
    length: jnp.ndarray  # (E,)
    vec_return: jnp.ndarray  # (E, d) discounted return of the episode
    horizon: jnp.ndarray  # (E,) float episode length (PCN's desired-horizon target)


class EpisodicBuffer(NamedTuple):
    data: EpisodeBatch
    size: jnp.ndarray  # int32 valid episodes

    @property
    def capacity(self) -> int:
        return self.data.obs.shape[0]

    @property
    def max_len(self) -> int:
        return self.data.obs.shape[1]

    @staticmethod
    def create(max_episodes: int, max_len: int, obs_dim: int, reward_dim: int, action_dtype=jnp.int32):
        data = EpisodeBatch(
            obs=jnp.zeros((max_episodes, max_len, obs_dim)),
            action=jnp.zeros((max_episodes, max_len), dtype=action_dtype),
            reward=jnp.zeros((max_episodes, max_len, reward_dim)),
            length=jnp.zeros((max_episodes,), dtype=jnp.int32),
            vec_return=jnp.full((max_episodes, reward_dim), -jnp.inf),
            horizon=jnp.zeros((max_episodes,)),
        )
        return EpisodicBuffer(data=data, size=jnp.int32(0))

    def add_episodes(self, eps: EpisodeBatch, lorenz_lambda: float | None = None) -> "EpisodicBuffer":
        """Append episodes then evict down to capacity by PCN's ranking.

        Score (to KEEP) = -(distance to non-dominated set) with a crowding
        penalty subtracted from near-duplicates, reproducing reference
        pcn.py:250-279's heap key on device with static shapes.  With
        ``lorenz_lambda`` the ranking uses (lambda-)Lorenz dominance (LCN,
        reference lcn.py:226-237).
        """
        cat = jax.tree.map(lambda a, b: jnp.concatenate([a, b], axis=0), self.data, eps)
        cap = self.capacity
        n_new = eps.vec_return.shape[0]
        valid = jnp.concatenate([jnp.arange(cap) < self.size, jnp.ones((n_new,), dtype=bool)])
        rank_vals = cat.vec_return
        if lorenz_lambda is not None:
            from ..core.pareto import lorenz_vector

            rank_vals = jnp.where(valid[:, None], lorenz_vector(cat.vec_return, lorenz_lambda), -jnp.inf)
        score = _pcn_keep_score(rank_vals, valid)
        _, top = jax.lax.top_k(jnp.where(valid, score, -jnp.inf), cap)
        data = jax.tree.map(lambda x: x[top], cat)
        new_size = jnp.minimum(self.size + n_new, cap)
        return EpisodicBuffer(data=data, size=new_size)

    def sample_steps(self, key: jax.Array, batch_size: int, gamma: float = 1.0):
        """Sample (episode, t) pairs uniformly over valid steps.

        Returns obs, action, desired_return (discounted reward-to-go from t),
        desired_horizon — the supervision tuple PCN trains on (reference
        pcn.py:202-240; episode rewards are accumulated as discounted-to-go).
        """
        k1, k2 = jax.random.split(key)
        e = jax.random.randint(k1, (batch_size,), 0, jnp.maximum(self.size, 1))
        lengths = self.data.length[e]
        t = (jax.random.uniform(k2, (batch_size,)) * lengths).astype(jnp.int32)
        t = jnp.clip(t, 0, self.max_len - 1)
        obs = self.data.obs[e, t]
        action = self.data.action[e, t]
        # discounted reward-to-go: sum_k>=t gamma^(k-t) r_k, masked to episode length
        ks = jnp.arange(self.max_len)[None, :]  # (1, T)
        mask = (ks >= t[:, None]) & (ks < lengths[:, None])
        disc = jnp.where(mask, gamma ** (ks - t[:, None]).astype(jnp.float32), 0.0)
        rtg = jnp.einsum("btd,bt->bd", self.data.reward[e], disc)
        horizon = (lengths - t).astype(jnp.float32)
        return obs, action, rtg, horizon

    def top_returns(self, k: int):
        """(values, valid) of the k best episodes' returns for command selection."""
        valid = jnp.arange(self.capacity) < self.size
        score = _pcn_keep_score(self.data.vec_return, valid)
        _, top = jax.lax.top_k(jnp.where(valid, score, -jnp.inf), k)
        return self.data.vec_return[top], self.data.horizon[top], valid[top]


def _pcn_keep_score(returns: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Higher = more worth keeping.  Non-dominated episodes first, then by
    crowding distance (diversity), then recency-free distance to the front."""
    from ..core.pareto import non_dominated_mask

    nd = non_dominated_mask(returns, valid)
    pts = jnp.where(valid[:, None], returns, -jnp.inf)
    # distance to nearest non-dominated point (0 for nd points themselves)
    nd_pts = jnp.where(nd[:, None], returns, jnp.inf)
    d2 = jnp.sum((pts[:, None, :] - nd_pts[None, :, :]) ** 2, axis=-1)
    dist = jnp.sqrt(jnp.min(jnp.where(nd[None, :], d2, jnp.inf), axis=-1))
    dist = jnp.where(jnp.isfinite(dist), dist, 1e9)
    crowd = crowding_distance(returns, valid)
    return nd.astype(jnp.float32) * 1e6 - dist + 1e-3 * crowd


def crowding_distance(points: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """NSGA-II crowding distance, vectorized (reference pcn.py crowding_distance)."""
    n, d = points.shape
    big = 1e9
    pts = jnp.where(valid[:, None], points, big)
    order = jnp.argsort(pts, axis=0)  # (n, d) indices per objective
    ranks = jnp.argsort(order, axis=0).astype(jnp.float32)
    srt = jnp.take_along_axis(pts, order, axis=0)
    span = jnp.maximum(srt[-1] - srt[0], 1e-9)
    gaps = jnp.concatenate([jnp.full((1, d), big), srt[2:] - srt[:-2], jnp.full((1, d), big)], axis=0) / span
    # map gaps back to original rows
    crowd = jnp.zeros((n, d))
    crowd = jnp.take_along_axis(gaps, ranks.astype(jnp.int32), axis=0)
    return jnp.where(valid, jnp.sum(jnp.minimum(crowd, big), axis=-1), 0.0)
