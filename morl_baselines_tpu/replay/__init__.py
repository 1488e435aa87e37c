"""Device-resident functional replay buffers."""

from .accrued import AccruedRewardReplayBuffer, AccruedTransition
from .buffer import ReplayBuffer, Transition
from .diverse import DiverseMemory
from .episodic import EpisodeBatch, EpisodicBuffer, crowding_distance
from .prioritized import PrioritizedReplayBuffer

__all__ = [
    "AccruedRewardReplayBuffer",
    "AccruedTransition",
    "DiverseMemory",
    "EpisodeBatch",
    "EpisodicBuffer",
    "PrioritizedReplayBuffer",
    "ReplayBuffer",
    "Transition",
    "crowding_distance",
]
