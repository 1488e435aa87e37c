"""Env registry — name -> constructor, mirroring MO-Gymnasium ids.

The reference builds envs by gym id via ``mo_gym.make`` (reference
experiments/benchmark/launch_experiment.py:136-146); here ``make`` returns a
pure-JAX MOEnv.
"""

from __future__ import annotations

from typing import Callable, Dict

from .base import MOEnv
from .breakable_bottles import BreakableBottles
from .dst import DeepSeaTreasure
from .four_room import FourRoom
from .fishwood import Fishwood
from .fruit_tree import FruitTree
from .lunar_lander import MOLunarLander, MOLunarLanderContinuous
from .minecart import Minecart
from .mountaincar import MOMountainCar, MOMountainCarContinuous
from .resource_gathering import ResourceGathering
from .water_reservoir import WaterReservoir


def _mujoco_env(maker):
    def build(**kw):
        from .mujoco import make_mo_halfcheetah, make_mo_hopper, make_mo_reacher

        return {"hopper": make_mo_hopper, "halfcheetah": make_mo_halfcheetah, "reacher": make_mo_reacher}[
            maker
        ](**kw)

    return build


def _planar_env(maker):
    def build(**kw):
        from .planar import make_mo_halfcheetah_jx, make_mo_hopper_jx

        return {"hopper": make_mo_hopper_jx, "halfcheetah": make_mo_halfcheetah_jx}[maker](**kw)

    return build


def _highway_env(**kw):
    from .highway import MOHighway

    return MOHighway(**kw)


def _pixel_env(stack: bool, **kw):
    from .pixel import PixelDST
    from .wrappers import wrap_pixel_stack

    env = PixelDST(**kw)
    return wrap_pixel_stack(env) if stack else env


ENV_REGISTRY: Dict[str, Callable[..., MOEnv]] = {
    "deep-sea-treasure-v0": lambda **kw: DeepSeaTreasure(dst_map="convex", **kw),
    "deep-sea-treasure-concave-v0": lambda **kw: DeepSeaTreasure(dst_map="concave", **kw),
    "fishwood-v0": Fishwood,
    "fruit-tree-v0": FruitTree,
    "resource-gathering-v0": ResourceGathering,
    "four-room-v0": FourRoom,
    "breakable-bottles-v0": BreakableBottles,
    "water-reservoir-v0": WaterReservoir,
    "mo-mountaincar-v0": MOMountainCar,
    "mo-mountaincarcontinuous-v0": MOMountainCarContinuous,
    "mo-lunar-lander-v3": MOLunarLander,
    "mo-lunar-lander-continuous-v3": MOLunarLanderContinuous,
    "minecart-v0": lambda **kw: Minecart(deterministic=False, **kw),
    "minecart-deterministic-v0": lambda **kw: Minecart(deterministic=True, **kw),
    # host-stepped MuJoCo (io_callback adapter; MJX unavailable in this image)
    "mo-hopper-v5": _mujoco_env("hopper"),
    "mo-halfcheetah-v5": _mujoco_env("halfcheetah"),
    # v4 aliases (reference examples use both generations interchangeably)
    "mo-hopper-v4": _mujoco_env("hopper"),
    "mo-halfcheetah-v4": _mujoco_env("halfcheetah"),
    "mo-reacher-v4": _mujoco_env("reacher"),
    "mo-reacher-v5": _mujoco_env("reacher"),
    # pixel-observation env + the reference's mario CNN wrapper stack
    # (launch_experiment.py:158-180) applied jit-side (envs/wrappers.py)
    "deep-sea-treasure-pixel-v0": lambda **kw: _pixel_env(stack=False, **kw),
    "deep-sea-treasure-pixel-stack-v0": lambda **kw: _pixel_env(stack=True, **kw),
    # device-resident pure-JAX MuJoCo-class locomotion (envs/planar.py):
    # same obs/action/reward interface as the host adapter, thousands of
    # envs per chip — the performance path for the continuous BASELINE configs
    "mo-hopper-jx-v5": _planar_env("hopper"),
    "mo-halfcheetah-jx-v5": _planar_env("halfcheetah"),
    # pure-JAX highway driving (mo-highway-v0 re-design, envs/highway.py)
    "mo-highway-jx-v0": _highway_env,
    "mo-highway-fast-jx-v0": lambda **kw: _highway_env(n_other=6, **kw),
}

# Envs whose exact discounted Pareto front is known (reference
# common/experiments.py:45-52).
ENVS_WITH_KNOWN_PARETO_FRONT = [
    "deep-sea-treasure-concave-v0",
    "deep-sea-treasure-v0",
    "minecart-v0",
    "minecart-deterministic-v0",
    "resource-gathering-v0",
    "fruit-tree-v0",
]


def make(env_id: str, **kwargs) -> MOEnv:
    if env_id not in ENV_REGISTRY:
        raise KeyError(f"unknown env id {env_id!r}; known: {sorted(ENV_REGISTRY)}")
    env = ENV_REGISTRY[env_id](**kwargs)
    # the requested id is the env's identity (aliases like mo-hopper-v4 must
    # not report the v5 name in logs/checkpoints)
    env.name = env_id
    return env
