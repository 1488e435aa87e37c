"""Algorithm suite: one module per algorithm, pure jitted update cores."""

from .base import MOAgentBase
from .capql import CAPQL, CAPQLConfig
from .envelope import Envelope, EnvelopeConfig
from .eupg import EUPG, EUPGConfig
from .gpils import GPILS, GPILSConfig
from .gpils_continuous import GPILSContinuous, GPILSContinuousConfig
from .gpipd import GPIPD, GPIPDConfig
from .gpipd_continuous import GPIPDContinuous, GPIPDContinuousConfig
from .ipro import IPRO, IPRO2D, IPROConfig
from .lcn import LCN, LCNConfig
from .moppo import MOPPO, MOPPOConfig
from .moql import MOQLearning, MOQLearningConfig
from .morld import MORLD, MORLDConfig
from .mosac import MOSAC, MOSACConfig, MOSACDiscrete
from .mpmoql import MPMOQLConfig, MPMOQLearning
from .nlmoppo import NLMOPPO, NLMOPPOConfig
from .pcn import PCN, PCNConfig
from .pgmorl import PGMORL, PGMORLConfig
from .pql import PQL, PQLConfig

__all__ = [
    "CAPQL",
    "CAPQLConfig",
    "EUPG",
    "EUPGConfig",
    "Envelope",
    "EnvelopeConfig",
    "GPILS",
    "GPILSConfig",
    "GPILSContinuous",
    "GPILSContinuousConfig",
    "GPIPD",
    "GPIPDConfig",
    "GPIPDContinuous",
    "GPIPDContinuousConfig",
    "IPRO",
    "IPRO2D",
    "IPROConfig",
    "LCN",
    "LCNConfig",
    "MOAgentBase",
    "MOPPO",
    "MOPPOConfig",
    "MOQLearning",
    "MOQLearningConfig",
    "MORLD",
    "MORLDConfig",
    "MOSAC",
    "MOSACConfig",
    "MOSACDiscrete",
    "MPMOQLConfig",
    "MPMOQLearning",
    "NLMOPPO",
    "NLMOPPOConfig",
    "PCN",
    "PCNConfig",
    "PGMORL",
    "PGMORLConfig",
    "PQL",
    "PQLConfig",
]
