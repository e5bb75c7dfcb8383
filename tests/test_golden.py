"""Golden control-sequence regression: every track config's MPC output on
the synthetic-window battery must match the committed fixtures (generated
by tools/gen_golden.py). Guards the whole solve pipeline — waypoints,
speed scans, assembly, ADMM — against silent numerical drift; the external
correctness anchor is the scipy fp64 parity in test_mpc/test_speed_profile."""

import dataclasses
import pathlib
import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tools"))
from gen_golden import HORIZON, TRACKS, battery

FIXTURE = (
    pathlib.Path(__file__).resolve().parent / "fixtures" / "golden_controls.npz"
)


@pytest.fixture(scope="module")
def golden():
    assert FIXTURE.exists(), "run tools/gen_golden.py to create fixtures"
    return np.load(FIXTURE)


@pytest.mark.parametrize("track", TRACKS)
def test_control_sequences_match_golden(track, golden):
    from acmpc_tpu.config import load_config
    from acmpc_tpu.dynamics import SpatialBicycleModel
    from acmpc_tpu.mpc.spatial_mpc import SpatialMPC

    root = pathlib.Path(__file__).resolve().parent.parent
    cfg = load_config(root / "configs" / f"{track}.yaml")
    control = dataclasses.replace(cfg.racing_control, horizon=HORIZON)
    model = SpatialBicycleModel(
        vehicle=cfg.vehicle,
        min_velocity=control.constraints.v_min,
        max_velocity=control.constraints.v_max,
    )
    mpc = SpatialMPC(control, model)
    v_cap = min(30.0, control.unlocalised_max_speed or 30.0)
    for name, ref in battery(HORIZON).items():
        key = f"{track}/{name}"
        state, _ = mpc.jitted_get_control(
            mpc.initial_state(), jnp.asarray(ref, jnp.float32), jnp.float32(v_cap)
        )
        assert bool(state.solved) == bool(golden[f"{key}/solved"]), key
        if not bool(state.solved):
            continue
        np.testing.assert_allclose(
            np.asarray(state.projected_control),
            golden[f"{key}/projected_control"],
            rtol=5e-3,
            atol=5e-3,
            err_msg=key,
        )
        np.testing.assert_allclose(
            np.asarray(state.cum_time),
            golden[f"{key}/cum_time"],
            rtol=5e-3,
            atol=5e-3,
            err_msg=key,
        )


def test_multi_track_matches_golden(golden):
    """The 7-track batched MultiTrackMPC program against its fixture
    (tools/gen_golden.py::multi_track_golden)."""
    from gen_golden import multi_track_golden

    root = pathlib.Path(__file__).resolve().parent.parent
    fresh = multi_track_golden(root)
    np.testing.assert_array_equal(
        fresh["multi_track/solved"], golden["multi_track/solved"]
    )
    for field in ("projected_control", "cum_time"):
        np.testing.assert_allclose(
            fresh[f"multi_track/{field}"],
            golden[f"multi_track/{field}"],
            rtol=5e-3,
            atol=5e-3,
            err_msg=field,
        )
