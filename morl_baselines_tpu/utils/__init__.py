from .logging import MetricLogger
from .profiling import PhaseTimer, trace
from .render import make_gif, rollout_frames
from .schedules import linearly_decaying_value, nearest_neighbors, unique_tol

__all__ = [
    "MetricLogger",
    "PhaseTimer",
    "linearly_decaying_value",
    "trace",
    "make_gif",
    "nearest_neighbors",
    "rollout_frames",
    "unique_tol",
]
