import numpy as np
import pytest

from acmpc_tpu.config.schema import PIDConfig
from acmpc_tpu.runtime import (
    BrakePID,
    SteeringPID,
    TemporalCommandInterpolator,
    TemporalCommandSelector,
    ThrottlePID,
)


def test_selector_picks_past_command():
    # commands active from their cum_time onwards
    cum_time = np.array([0.1, 0.2, 0.3, 0.4])
    commands = np.arange(4.0).reshape(4, 1)
    sel = TemporalCommandSelector()
    assert sel(cum_time, commands, 0.21)[0] == 1.0
    assert sel(cum_time, commands, 0.31)[0] == 2.0
    # beyond the horizon: clamp to last
    assert sel(cum_time, commands, 9.0)[0] == 3.0


def test_interpolator_midpoint():
    cum_time = np.array([0.0, 1.0, 2.0, 3.0])
    commands = np.array([[0.0], [10.0], [20.0], [30.0]])
    interp = TemporalCommandInterpolator()
    # interior: linear interpolation between bracketing commands
    np.testing.assert_allclose(interp(cum_time, commands, 1.25), [12.5])
    np.testing.assert_allclose(interp(cum_time, commands, 1.75), [17.5])
    # endpoints return the boundary command un-interpolated
    # (reference commands.py:79-80)
    np.testing.assert_allclose(interp(cum_time, commands, 0.25), [0.0])
    np.testing.assert_allclose(interp(cum_time, commands, 3.0), [30.0])


def _pid_cfg(p=1.0, i=0.0, d=0.0):
    return PIDConfig(proportional=p, integral=i, derivative=d, sampling_interval_s=0.01)


def test_throttle_pid_clamped():
    pid = ThrottlePID(_pid_cfg(p=10.0))
    out = pid(0.0, 100.0, now=0.0)
    assert out == 1.0  # clamped to throttle max
    out = pid(200.0, 100.0, now=0.1)
    assert out == 0.0  # clamped to throttle min


def test_brake_pid_dead_zone_and_sign():
    pid = BrakePID(_pid_cfg(p=0.5))
    # current speed above target + dead zone -> braking (positive output)
    out = pid(20.0, 10.0, now=0.0)
    assert 0.0 < out <= 1.0
    # below target: no braking
    pid2 = BrakePID(_pid_cfg(p=0.5))
    assert pid2(5.0, 10.0, now=0.0) == 0.0


def test_steering_pid_proportional():
    pid = SteeringPID(_pid_cfg(p=1.0))
    out = pid(0.0, 0.5, now=0.0)
    assert abs(out - 0.5) < 1e-9


def test_pid_sample_time_gating():
    pid = SteeringPID(_pid_cfg(p=1.0))
    out1 = pid(0.0, 0.5, now=0.0)
    # called again within the sampling interval: returns last output
    out2 = pid(0.4, 0.5, now=0.005)
    assert out2 == out1
    # after the interval it updates
    out3 = pid(0.4, 0.5, now=0.02)
    assert abs(out3 - 0.1) < 1e-9
