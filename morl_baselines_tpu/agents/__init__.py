"""Algorithm suite: one module per algorithm, pure jitted update cores."""

from .base import MOAgentBase
from .envelope import Envelope, EnvelopeConfig
from .eupg import EUPG, EUPGConfig
from .moql import MOQLearning, MOQLearningConfig

__all__ = [
    "EUPG",
    "EUPGConfig",
    "Envelope",
    "EnvelopeConfig",
    "MOAgentBase",
    "MOQLearning",
    "MOQLearningConfig",
]
