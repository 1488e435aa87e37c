"""Pure-JAX multi-objective environments (device-resident MO-Gymnasium parity)."""

from .base import ArrayBox, Box, Discrete, MOEnv, StepOut
from .highway import MOHighway
from .pixel import PixelDST
from .wrappers import (
    FlattenObservation,
    FrameStackObservation,
    GrayscaleObservation,
    MOMaxAndSkipObservation,
    ResizeObservation,
    TimeLimit,
    wrap_pixel_stack,
)
from .breakable_bottles import BreakableBottles
from .dst import DeepSeaTreasure
from .four_room import FourRoom
from .fishwood import Fishwood, fishwood_utility
from .fruit_tree import FruitTree
from .lunar_lander import MOLunarLander, MOLunarLanderContinuous
from .minecart import Minecart
from .mountaincar import MOMountainCar, MOMountainCarContinuous
from .registry import ENV_REGISTRY, ENVS_WITH_KNOWN_PARETO_FRONT, make
from .resource_gathering import ResourceGathering
from .water_reservoir import WaterReservoir
from .vector import (
    EpisodeStats,
    RewardNormState,
    VecStepOut,
    VectorMOEnv,
    normalize_reward,
)

__all__ = [
    "ArrayBox",
    "Box",
    "FlattenObservation",
    "FrameStackObservation",
    "GrayscaleObservation",
    "MOHighway",
    "MOMaxAndSkipObservation",
    "PixelDST",
    "ResizeObservation",
    "TimeLimit",
    "wrap_pixel_stack",
    "Discrete",
    "DeepSeaTreasure",
    "ENVS_WITH_KNOWN_PARETO_FRONT",
    "ENV_REGISTRY",
    "EpisodeStats",
    "Fishwood",
    "FruitTree",
    "BreakableBottles",
    "FourRoom",
    "Minecart",
    "MOLunarLander",
    "MOLunarLanderContinuous",
    "WaterReservoir",
    "MOEnv",
    "MOMountainCar",
    "MOMountainCarContinuous",
    "ResourceGathering",
    "RewardNormState",
    "StepOut",
    "VecStepOut",
    "VectorMOEnv",
    "fishwood_utility",
    "make",
    "normalize_reward",
]
