"""Observation-wrapper stack tests (reference launch_experiment.py:147-181)."""

import jax
import jax.numpy as jnp
import numpy as np

from morl_baselines_tpu.envs import (
    FlattenObservation,
    FrameStackObservation,
    GrayscaleObservation,
    MOMaxAndSkipObservation,
    PixelDST,
    ResizeObservation,
    TimeLimit,
    VectorMOEnv,
    make,
)


def test_pixel_dst_renders_and_matches_dynamics():
    env = make("deep-sea-treasure-pixel-v0")
    state, obs = env.reset(jax.random.key(0))
    assert obs.shape == (88, 80, 3) and obs.dtype == jnp.uint8
    # the agent cell is rendered at the start position (top-left, red)
    np.testing.assert_array_equal(np.asarray(obs[0, 0]), [220, 50, 50])
    out = env.step(state, jnp.int32(1), jax.random.key(1))  # down -> treasure 0.7
    np.testing.assert_allclose(np.asarray(out.reward), [0.7, -1.0], rtol=1e-6)
    assert bool(out.terminated)
    # agent rendered at the new cell
    np.testing.assert_array_equal(np.asarray(out.obs[8, 0]), [220, 50, 50])


def test_grayscale_resize_flatten_shapes():
    env = GrayscaleObservation(PixelDST())
    _, obs = env.reset(jax.random.key(0))
    assert obs.shape == (88, 80) and obs.dtype == jnp.uint8
    env = ResizeObservation(GrayscaleObservation(PixelDST()), (84, 84))
    _, obs = env.reset(jax.random.key(0))
    assert obs.shape == (84, 84)
    env = FlattenObservation(PixelDST())
    _, obs = env.reset(jax.random.key(0))
    assert obs.shape == (88 * 80 * 3,) and env.obs_dim == 88 * 80 * 3


def test_frame_stack_rolls():
    env = FrameStackObservation(GrayscaleObservation(PixelDST()), 4)
    state, obs = env.reset(jax.random.key(0))
    assert obs.shape == (4, 88, 80)
    # reset pads with the reset frame
    np.testing.assert_array_equal(np.asarray(obs[0]), np.asarray(obs[3]))
    out = env.step(state, jnp.int32(3), jax.random.key(1))  # move right
    # oldest 3 frames are the previous newest 3; newest differs from oldest
    np.testing.assert_array_equal(np.asarray(out.obs[:3]), np.asarray(obs[1:]))
    assert not np.array_equal(np.asarray(out.obs[3]), np.asarray(out.obs[0]))


def test_max_and_skip_accumulates_vector_reward_and_freezes_after_done():
    env = MOMaxAndSkipObservation(make("deep-sea-treasure-v0"), skip=4)
    state, _ = env.reset(jax.random.key(0))
    out = env.step(state, jnp.int32(3), jax.random.key(1))  # 4x right
    np.testing.assert_allclose(np.asarray(out.reward), [0.0, -4.0])
    # down hits the col-0..3 path: terminate at first treasure mid-skip;
    # reward must stop accruing after termination
    state, _ = env.reset(jax.random.key(0))
    out = env.step(state, jnp.int32(1), jax.random.key(1))  # down -> treasure at depth 1
    assert bool(out.terminated)
    np.testing.assert_allclose(np.asarray(out.reward), [0.7, -1.0], rtol=1e-6)


def test_time_limit_truncates():
    env = TimeLimit(make("deep-sea-treasure-pixel-v0"), max_episode_steps=3)
    state, _ = env.reset(jax.random.key(0))
    for i in range(3):
        out = env.step(state, jnp.int32(0), jax.random.key(i))  # up: no-op, never terminates
        state = out.state
    assert bool(out.truncated)


def test_full_stack_under_vmap_scan():
    env = make("deep-sea-treasure-pixel-stack-v0")
    venv = VectorMOEnv(env, 4)
    state, obs = venv.reset(jax.random.key(0))
    assert obs.shape == (4, 4 * 84 * 84)

    def body(carry, key):
        st, _ = carry
        acts = jax.random.randint(key, (4,), 0, 4)
        out = venv.step(st, acts, key)
        return (out.state, out.obs), out.reward

    (_, obs), rewards = jax.lax.scan(body, (state, obs), jax.random.split(jax.random.key(1), 10))
    assert rewards.shape == (10, 4, 2)
    assert np.isfinite(np.asarray(rewards)).all()


def test_envelope_cnn_trunk_trains():
    from morl_baselines_tpu.agents.envelope import Envelope, EnvelopeConfig

    env = make("deep-sea-treasure-pixel-stack-v0")
    cfg = EnvelopeConfig(
        num_envs=4, buffer_size=128, batch_size=8, learning_starts=8,
        hidden=(32, 32), image_shape=(4, 84, 84), num_sample_w=2,
    )
    agent = Envelope(env, cfg)
    state = agent.init_state(jax.random.key(0))
    state = agent.train_segment(state, 6)
    assert int(state.global_step) == 24
    assert np.isfinite(
        float(jnp.sum(jax.tree.reduce(lambda a, b: a + jnp.sum(jnp.abs(b)), state.ts.params, 0.0)))
    )
