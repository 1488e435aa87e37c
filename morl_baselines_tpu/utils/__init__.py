from .logging import MetricLogger
from .render import make_gif, rollout_frames
from .schedules import linearly_decaying_value, nearest_neighbors, unique_tol

__all__ = [
    "MetricLogger",
    "linearly_decaying_value",
    "make_gif",
    "nearest_neighbors",
    "rollout_frames",
    "unique_tol",
]
