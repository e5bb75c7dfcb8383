import jax
import jax.numpy as jnp
import numpy as np

from acmpc_tpu.dynamics import SpatialBicycleModel, VehicleParams
from acmpc_tpu.geometry.tracks import get_hairpin_track, get_straight_track, with_widths
from acmpc_tpu.mpc.spatial_mpc import MPCConfig, SpatialMPC
from acmpc_tpu.parallel import make_mesh, scenario_sharding, sharded_get_control
from acmpc_tpu.parallel.mesh import replicate_state
from acmpc_tpu.qp.speed_profile import SpeedProfileConstraints

CONSTRAINTS = SpeedProfileConstraints(
    v_min=5.0, v_max=30.0, a_min=-3.0, a_max=6.0,
    ay_max=5.5, ki_min=0.005, end_velocity=10.0,
)
CONFIG = MPCConfig(
    horizon=16,
    step_cost=(4.0e-3, 5.0e-2, 0.0),
    r_term=(1.0e-2, 10.0),
    final_cost=(1.0, 0.0, 0.1),
    constraints=CONSTRAINTS,
)


def test_eight_device_scenario_shard():
    assert jax.device_count() >= 8, "conftest must force 8 virtual devices"
    model = SpatialBicycleModel(
        vehicle=VehicleParams(),
        min_velocity=CONSTRAINTS.v_min,
        max_velocity=CONSTRAINTS.v_max,
    )
    mpc = SpatialMPC(CONFIG, model)
    mesh = make_mesh(8)
    step = sharded_get_control(mpc, mesh)

    batch = 16  # 2 scenarios per device
    tracks = [
        get_straight_track(100.0, CONFIG.horizon)
        if i % 2
        else get_hairpin_track(20.0 + i, CONFIG.horizon)
        for i in range(batch)
    ]
    refs = jnp.stack([jnp.asarray(with_widths(t), jnp.float32) for t in tracks])
    refs = jax.device_put(refs, scenario_sharding(mesh))
    states = replicate_state(mpc, batch)

    new_states, fleet = step(states, refs)
    assert int(fleet["n_solved"]) == batch
    assert new_states.projected_control.shape == (batch, 2, CONFIG.horizon - 1)
    # sharded result matches the unsharded vmap path
    ref_states, _ = jax.jit(jax.vmap(mpc.get_control))(
        replicate_state(mpc, batch), refs
    )
    np.testing.assert_allclose(
        np.asarray(new_states.projected_control),
        np.asarray(ref_states.projected_control),
        rtol=2e-3,
        atol=2e-3,
    )


def test_pod_mesh_sharded_lap_sweep():
    """Multi-device closed-loop sweep over the ("host","chip") mesh."""
    from acmpc_tpu.bench import LapSweep, SweepGrid
    from acmpc_tpu.parallel.multihost import (
        grid_sharding,
        make_pod_mesh,
        sharded_lap_sweep,
    )
    from test_localise import make_asymmetric_map

    model = SpatialBicycleModel(
        vehicle=VehicleParams(),
        min_velocity=CONSTRAINTS.v_min,
        max_velocity=CONSTRAINTS.v_max,
    )
    mpc = SpatialMPC(CONFIG, model)
    tm = make_asymmetric_map(800)
    sweep = LapSweep(mpc, tm, half_width=5.0, dt=0.1)

    mesh = make_pod_mesh(hosts=2)  # 2x4 over the virtual 8-device mesh
    assert mesh.devices.shape == (2, 4)
    run = sharded_lap_sweep(sweep, mesh, n_steps=20)

    batch = 16
    grid = SweepGrid.perturbed(
        jax.random.PRNGKey(1), batch, tm.centre.shape[0], v_max=20.0
    )
    grid = jax.device_put(grid, grid_sharding(mesh))
    metrics, fleet = run(grid)
    assert int(fleet["n_solves"]) == batch * 20
    assert int(fleet["n_solved"]) >= 0.9 * batch * 20
    assert float(fleet["mean_speed"]) > 5.0
    # matches the unsharded sweep
    _, ref_metrics = sweep.run(grid, 20)
    np.testing.assert_allclose(
        np.asarray(metrics["v"]), np.asarray(ref_metrics["v"]), rtol=2e-3, atol=1e-3
    )


def test_fused_batched_path_matches_vmap():
    """Explicitly-batched (fused-Pallas on TPU, interpret on CPU) control
    step equals the vmap path."""
    model = SpatialBicycleModel(
        vehicle=VehicleParams(),
        min_velocity=CONSTRAINTS.v_min,
        max_velocity=CONSTRAINTS.v_max,
    )
    mpc = SpatialMPC(CONFIG, model)
    batch = 4
    tracks = [get_hairpin_track(20.0 + 4 * i, CONFIG.horizon) for i in range(batch)]
    refs = jnp.stack([jnp.asarray(with_widths(t), jnp.float32) for t in tracks])
    states = replicate_state(mpc, batch)
    ref_out, _ = mpc.batched_get_control(states, refs)
    fused_out, _ = mpc.batched_get_control_fused(states, refs)
    assert bool(fused_out.solved.all())
    np.testing.assert_allclose(
        np.asarray(fused_out.projected_control),
        np.asarray(ref_out.projected_control),
        rtol=5e-3, atol=5e-3,
    )


def test_launch_pod_cli_virtual_mesh():
    """The pod launch CLI (SURVEY §5.8 multi-host tooling) runs the
    pod-sharded sweep end-to-end on the virtual mesh and prints a fleet
    summary."""
    import json
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    out = subprocess.run(
        [sys.executable, "-m", "acmpc_tpu.cli.launch_pod",
         "--scenarios-per-chip", "1", "--steps", "3"],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["chips"] == 8
    assert summary["scenarios"] == 8
    assert summary["success_rate"] > 0.9
