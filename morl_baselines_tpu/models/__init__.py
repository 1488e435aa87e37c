"""Flax model components: trunks, conditioned Q-nets, actors, ensembles."""

from .continuous import (
    ContinuousQNet,
    DeterministicActor,
    DiscreteQNet,
    DiscreteSACActor,
    SquashedGaussianActor,
)
from .networks import (
    MLP,
    EnvelopeQNet,
    NatureCNN,
    TrainState,
    WeightConditionedQNet,
    ensemble,
    huber,
    polyak_update,
)

__all__ = [
    "ContinuousQNet",
    "DeterministicActor",
    "DiscreteQNet",
    "DiscreteSACActor",
    "EnvelopeQNet",
    "MLP",
    "NatureCNN",
    "SquashedGaussianActor",
    "TrainState",
    "WeightConditionedQNet",
    "ensemble",
    "huber",
    "polyak_update",
]
