import jax
import jax.numpy as jnp
import numpy as np

from acmpc_tpu.bench import LapSweep, SweepGrid
from acmpc_tpu.dynamics import SpatialBicycleModel, VehicleParams
from acmpc_tpu.mpc.spatial_mpc import MPCConfig, SpatialMPC
from acmpc_tpu.qp.speed_profile import SpeedProfileConstraints
from test_localise import make_asymmetric_map


def test_on_device_lap_sweep():
    constraints = SpeedProfileConstraints(
        v_min=5.0, v_max=25.0, a_min=-3.0, a_max=6.0,
        ay_max=5.5, ki_min=0.005, end_velocity=10.0,
    )
    config = MPCConfig(
        horizon=16,
        step_cost=(4.0e-3, 5.0e-2, 0.0),
        r_term=(1.0e-2, 10.0),
        final_cost=(1.0, 0.0, 0.1),
        constraints=constraints,
    )
    model = SpatialBicycleModel(
        vehicle=VehicleParams(), min_velocity=5.0, max_velocity=25.0
    )
    mpc = SpatialMPC(config, model)
    tm = make_asymmetric_map(800)

    sweep = LapSweep(mpc, tm, half_width=5.0, dt=0.1)
    batch, n_steps = 4, 40
    grid = SweepGrid.perturbed(
        jax.random.PRNGKey(0), batch, tm.centre.shape[0], v_max=20.0
    )
    cars, metrics = sweep.run(grid, n_steps)
    summary = sweep.summarise(metrics, n_steps)

    assert summary["total_solves"] == batch * n_steps
    assert summary["solve_success_rate"] > 0.9
    # all cars stay in the corridor and keep moving
    assert summary["p95_offtrack_m"] < 5.0, summary
    assert summary["mean_speed_ms"] > 8.0, summary
    # cars actually progressed around the track
    v = np.asarray(metrics["v"])
    assert (v.mean(axis=1) > 5.0).all()


def test_fused_sweep_matches_vmap_sweep():
    constraints = SpeedProfileConstraints(
        v_min=5.0, v_max=25.0, a_min=-3.0, a_max=6.0,
        ay_max=5.5, ki_min=0.005, end_velocity=10.0,
    )
    config = MPCConfig(
        horizon=16,
        step_cost=(4.0e-3, 5.0e-2, 0.0),
        r_term=(1.0e-2, 10.0),
        final_cost=(1.0, 0.0, 0.1),
        constraints=constraints,
    )
    model = SpatialBicycleModel(
        vehicle=VehicleParams(), min_velocity=5.0, max_velocity=25.0
    )
    mpc = SpatialMPC(config, model)
    tm = make_asymmetric_map(800)
    sweep = LapSweep(mpc, tm, half_width=5.0, dt=0.1)
    grid = SweepGrid.perturbed(
        jax.random.PRNGKey(3), 4, tm.centre.shape[0], v_max=20.0
    )
    _, m_ref = sweep.run(grid, 15)
    _, m_fused = sweep.run_fused(grid, 15)
    assert m_fused["v"].shape == m_ref["v"].shape
    np.testing.assert_allclose(
        np.asarray(m_fused["v"]), np.asarray(m_ref["v"]), rtol=5e-3, atol=5e-2
    )


def test_raceline_tracking_sweep():
    """LapSweep tracks an arbitrary reference polyline with per-point
    corridor widths (BASELINE config 1: the shipped raceline); the
    off-track metric still measures against the map centreline."""
    constraints = SpeedProfileConstraints(
        v_min=5.0, v_max=25.0, a_min=-3.0, a_max=6.0,
        ay_max=5.5, ki_min=0.005, end_velocity=10.0,
    )
    config = MPCConfig(
        horizon=16,
        step_cost=(4.0e-3, 5.0e-2, 0.0),
        r_term=(1.0e-2, 10.0),
        final_cost=(1.0, 0.0, 0.1),
        constraints=constraints,
    )
    model = SpatialBicycleModel(
        vehicle=VehicleParams(), min_velocity=5.0, max_velocity=25.0
    )
    mpc = SpatialMPC(config, model)
    tm = make_asymmetric_map(800)

    # a "raceline": the centreline shifted 1.5 m toward the inside
    centre = np.asarray(tm.centre)
    left = np.asarray(tm.left)
    to_left = left - centre
    to_left /= np.linalg.norm(to_left, axis=1, keepdims=True)
    line = centre + 1.5 * to_left
    widths = np.full(len(line), 2.0 * (5.0 - 1.5), np.float32)

    sweep = LapSweep(
        mpc, tm, half_width=5.0, dt=0.1,
        reference_polyline=line, reference_widths=widths,
    )
    grid = SweepGrid(
        start_index=jnp.array([50, 400], jnp.int32),
        lateral_offset=jnp.zeros(2),
        v_max=jnp.full(2, 18.0),
    )
    cars, metrics = sweep.run_fused(grid, 30)
    s = sweep.summarise(metrics, 30)
    assert s["solve_success_rate"] > 0.9
    # cars follow the OFFSET line: distance to map centre ~1.5 m, inside
    # the corridor
    off = np.asarray(metrics["offtrack"])[:, -10:]
    assert 0.5 < off.mean() < 3.0, f"mean offset {off.mean():.2f}"
    assert off.max() < 5.0
