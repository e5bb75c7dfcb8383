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
from acmpc_tpu.runtime.agent import Agent
from acmpc_tpu.runtime.controller import Controller
from acmpc_tpu.runtime.mailbox import Mailbox
from acmpc_tpu.runtime.sim import SimulatorInterface, SyntheticSimulator

__all__ += ["Agent", "Controller", "Mailbox", "SimulatorInterface", "SyntheticSimulator"]
