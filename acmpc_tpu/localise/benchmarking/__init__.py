from acmpc_tpu.localise.benchmarking.benchmark import BenchmarkLocalisation
from acmpc_tpu.localise.benchmarking.recording import (
    LocalisationRecorder,
    LocalisationRecording,
)
from acmpc_tpu.localise.benchmarking.tracker import LocalisationTracker

__all__ = [
    "BenchmarkLocalisation",
    "LocalisationRecorder",
    "LocalisationRecording",
    "LocalisationTracker",
]
