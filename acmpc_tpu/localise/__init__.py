from acmpc_tpu.localise.localiser import Localiser
from acmpc_tpu.localise.particle_filter import (
    PFConfig,
    PFState,
    ParticleFilter,
)
from acmpc_tpu.localise.track_map import TrackMap, load_track_map, save_track_map

__all__ = [
    "Localiser",
    "PFConfig",
    "PFState",
    "ParticleFilter",
    "TrackMap",
    "load_track_map",
    "save_track_map",
]
