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
