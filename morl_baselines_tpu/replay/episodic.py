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

    def add_episodes(self, eps: EpisodeBatch) -> "EpisodicBuffer":
        """Append episodes then evict down to capacity by PCN's ranking.

        Score (to KEEP) = -(distance to non-dominated set) with a crowding
        penalty subtracted from near-duplicates, reproducing reference
        pcn.py:250-279's heap key on device with static shapes.
        """
        cat = jax.tree.map(lambda a, b: jnp.concatenate([a, b], axis=0), self.data, eps)
        n_total = cat.vec_return.shape[0]
        valid = jnp.arange(n_total) < (self.size + eps.vec_return.shape[0])
        score = _pcn_keep_score(cat.vec_return, valid)
        cap = self.capacity
        _, top = jax.lax.top_k(jnp.where(valid, score, -jnp.inf), cap)
        data = jax.tree.map(lambda x: x[top], cat)
        new_size = jnp.minimum(self.size + eps.vec_return.shape[0], cap)
        return EpisodicBuffer(data=data, size=new_size)

    def sample_steps(self, key: jax.Array, batch_size: int):
        """Sample (episode, t) pairs uniformly over valid steps.

        Returns obs, action, desired_return (reward-to-go), desired_horizon —
        exactly the supervision tuple PCN trains on (reference pcn.py:202-236).
        """
        k1, k2 = jax.random.split(key)
        e = jax.random.randint(k1, (batch_size,), 0, jnp.maximum(self.size, 1))
        lengths = self.data.length[e]
        t = (jax.random.uniform(k2, (batch_size,)) * lengths).astype(jnp.int32)
        t = jnp.clip(t, 0, self.max_len - 1)
        obs = self.data.obs[e, t]
        action = self.data.action[e, t]
        # reward-to-go from t (undiscounted cumulative from behind, as PCN does)
        csum = jnp.cumsum(self.data.reward[e], axis=1)
        total = csum[jnp.arange(batch_size), lengths - 1]
        before = jnp.where((t > 0)[:, None], csum[jnp.arange(batch_size), jnp.maximum(t - 1, 0)], 0.0)
        rtg = total - before
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
