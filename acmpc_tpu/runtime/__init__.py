from acmpc_tpu.runtime.commands import (
    TemporalCommandInterpolator,
    TemporalCommandSelector,
)
from acmpc_tpu.runtime.pid import PID, BrakePID, SteeringPID, ThrottlePID

__all__ = [
    "PID",
    "BrakePID",
    "SteeringPID",
    "TemporalCommandInterpolator",
    "TemporalCommandSelector",
    "ThrottlePID",
]
