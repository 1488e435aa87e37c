"""Replay buffer tests: ring semantics, PER proportional sampling, episodic ranking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morl_baselines_tpu.replay import (
    AccruedRewardReplayBuffer,
    AccruedTransition,
    EpisodeBatch,
    EpisodicBuffer,
    PrioritizedReplayBuffer,
    ReplayBuffer,
    Transition,
)


def _mk_batch(n, obs_dim=3, d=2, offset=0):
    return Transition(
        obs=jnp.arange(n * obs_dim, dtype=jnp.float32).reshape(n, obs_dim) + offset,
        action=jnp.arange(n, dtype=jnp.int32) % 4,
        reward=jnp.ones((n, d)) * (offset + 1),
        next_obs=jnp.zeros((n, obs_dim)),
        terminated=jnp.zeros((n,)),
    )


def test_ring_wraparound():
    buf = ReplayBuffer.create(8, obs_dim=3, reward_dim=2)
    add = jax.jit(ReplayBuffer.add_batch)
    buf = add(buf, _mk_batch(6, offset=0))
    assert int(buf.size) == 6 and int(buf.ptr) == 6
    buf = add(buf, _mk_batch(6, offset=100))
    assert int(buf.size) == 8 and int(buf.ptr) == 4
    # rows 6,7,0,1,2,3 now hold the offset-100 batch
    np.testing.assert_allclose(np.asarray(buf.data.reward[6]), [101.0, 101.0])
    np.testing.assert_allclose(np.asarray(buf.data.reward[3]), [101.0, 101.0])
    np.testing.assert_allclose(np.asarray(buf.data.reward[4]), [1.0, 1.0])


def test_sample_and_cer():
    buf = ReplayBuffer.create(64, obs_dim=2, reward_dim=2)
    buf = buf.add_batch(_mk_batch(10, obs_dim=2))
    batch = jax.jit(lambda b, k: b.sample(k, 16, use_cer=True))(buf, jax.random.key(0))
    assert batch.obs.shape == (16, 2)
    # CER: first sample is the latest transition (row 9)
    np.testing.assert_allclose(np.asarray(batch.obs[0]), np.asarray(buf.data.obs[9]))


def test_prioritized_proportional():
    buf = PrioritizedReplayBuffer.create(16, obs_dim=1, reward_dim=2)
    buf = buf.add_batch(
        Transition(
            obs=jnp.arange(4, dtype=jnp.float32)[:, None],
            action=jnp.zeros(4, dtype=jnp.int32),
            reward=jnp.zeros((4, 2)),
            next_obs=jnp.zeros((4, 1)),
            terminated=jnp.zeros(4),
        )
    )
    # give row 2 overwhelming priority
    buf = buf.update_priorities(jnp.array([0, 1, 2, 3]), jnp.array([1e-6, 1e-6, 1.0, 1e-6]))
    batch, idx, probs = jax.jit(lambda b, k: b.sample(k, 256))(buf, jax.random.key(0))
    frac = float(jnp.mean((idx == 2).astype(jnp.float32)))
    assert frac > 0.98
    assert float(buf.max_priority) == 1.0
    buf2 = buf.reset_priorities()
    p = np.asarray(buf2.priorities)
    assert (p[:4] == 1.0).all() and (p[4:] == 0.0).all()


def test_accrued_buffer():
    buf = AccruedRewardReplayBuffer.create(32, obs_dim=1, reward_dim=2)
    tr = AccruedTransition(
        obs=jnp.ones((5, 1)),
        accrued_reward=jnp.ones((5, 2)) * 3,
        action=jnp.zeros(5, dtype=jnp.int32),
        reward=jnp.ones((5, 2)),
        next_obs=jnp.ones((5, 1)),
        terminated=jnp.zeros(5),
        timestep=jnp.arange(5, dtype=jnp.int32),
    )
    buf = buf.add_batch(tr)
    assert int(buf.size) == 5
    data, valid = buf.get_all()
    assert int(valid.sum()) == 5
    buf = buf.reset()
    assert int(buf.size) == 0


def test_episodic_buffer_ranking_and_rtg():
    buf = EpisodicBuffer.create(4, max_len=6, obs_dim=2, reward_dim=2)
    # 6 episodes; the 4 best (non-dominated or closest) should survive
    returns = jnp.array([[1.0, 0.0], [0.0, 1.0], [0.9, 0.9], [0.1, 0.1], [0.05, 0.05], [0.5, 0.5]])
    eps = EpisodeBatch(
        obs=jnp.zeros((6, 6, 2)),
        action=jnp.zeros((6, 6), dtype=jnp.int32),
        reward=jnp.tile(returns[:, None, :] / 3.0, (1, 6, 1)).at[:, 3:].set(0.0),
        length=jnp.full((6,), 3, dtype=jnp.int32),
        vec_return=returns,
        horizon=jnp.full((6,), 3.0),
    )
    buf = jax.jit(EpisodicBuffer.add_episodes)(buf, eps)
    assert int(buf.size) == 4
    kept = np.asarray(buf.data.vec_return)
    # the clearly-worst episodes (0.05,0.05)/(0.1,0.1) must be evicted
    assert not any(np.allclose(k, [0.05, 0.05]) for k in kept)
    obs, action, rtg, horizon = buf.sample_steps(jax.random.key(0), 32)
    assert obs.shape == (32, 2) and rtg.shape == (32, 2)
    # at t=0, rtg equals the full (undiscounted) return of the episode
    vals, hors, valid = buf.top_returns(2)
    assert vals.shape == (2, 2) and bool(valid.all())
