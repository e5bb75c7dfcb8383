from acmpc_tpu.geometry.path import ReferencePath, construct_waypoints
from acmpc_tpu.geometry.tracks import (
    get_chicane_track,
    get_curved_track,
    get_hairpin_track,
    get_straight_track,
    rotate_track_points,
)

__all__ = [
    "ReferencePath",
    "construct_waypoints",
    "get_chicane_track",
    "get_curved_track",
    "get_hairpin_track",
    "get_straight_track",
    "rotate_track_points",
]
