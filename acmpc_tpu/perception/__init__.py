from acmpc_tpu.perception.camera import CameraInfo
from acmpc_tpu.perception.observations import ObservationDict
from acmpc_tpu.perception.segmentation import TrackSegmenter
from acmpc_tpu.perception.tracks import TrackLimitExtractor

__all__ = [
    "CameraInfo",
    "ObservationDict",
    "TrackLimitExtractor",
    "TrackSegmenter",
]
