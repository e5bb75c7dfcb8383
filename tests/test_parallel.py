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
