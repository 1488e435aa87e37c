"""Rendering + GIF export — counterpart of reference common/utils.py:50-68.

The reference renders through gym's rgb_array frames and moviepy. Pure-JAX
envs have no render loop, so envs may implement ``render_frame(state) ->
(H, W, 3) uint8`` (host numpy, visualization only); ``rollout_frames`` steps
one env on host collecting frames, and ``make_gif`` writes them with PIL
(moviepy is not in the image).
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, List

import jax
import numpy as np


def make_gif(frames: List[np.ndarray], path: str | Path, fps: int = 15) -> Path:
    """Write a list of (H, W, 3) uint8 frames as an animated GIF."""
    from PIL import Image

    if not frames:
        raise ValueError("make_gif needs at least one frame")
    path = Path(path)
    if path.suffix != ".gif":
        path = path.with_suffix(".gif")
    path.parent.mkdir(parents=True, exist_ok=True)
    imgs = [Image.fromarray(np.asarray(f, dtype=np.uint8)) for f in frames]
    imgs[0].save(path, save_all=True, append_images=imgs[1:], duration=int(1000 / fps), loop=0)
    return path


def rollout_frames(
    env,
    act: Callable,
    key: jax.Array,
    max_steps: int = 500,
) -> List[np.ndarray]:
    """Host rollout collecting ``env.render_frame`` images.

    ``act(obs, key) -> action``. Slow by design (one host step per frame);
    use only for visualization.
    """
    if not hasattr(env, "render_frame"):
        raise NotImplementedError(f"{env.name} does not implement render_frame")
    key, kr = jax.random.split(key)
    state, obs = env.reset(kr)
    step = jax.jit(env.step)
    frames = [env.render_frame(state)]
    for _ in range(max_steps):
        key, ka, ks = jax.random.split(key, 3)
        out = step(state, act(obs, ka), ks)
        state, obs = out.state, out.obs
        frames.append(env.render_frame(state))
        if bool(out.terminated) or bool(out.truncated):
            break
    return frames
