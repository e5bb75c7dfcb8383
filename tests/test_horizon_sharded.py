"""Within-solve horizon parallelism over the device mesh (BASELINE's
"per-block QP reductions combined via ICI collectives", SURVEY.md §5.7):

* ops/tridiag_sharded.py — SPIKE distributed tridiagonal solve: per-block
  PCR reduction, one 6-float all_gather, replicated interface solve;
* qp/speed_profile.py::solve_speed_profile_sharded — sharded (min,+)
  scans with 2-float block summaries (production map-scale path);
* qp/speed_profile.py::solve_speed_profile_admm_sharded — the general
  iterative engine with ppermute halos and pmax residual reductions;
* SpatialMPC.compute_map_speed_profile(mesh=...) — the production entry.

All verified against the single-device solvers on the virtual 8-device
CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from acmpc_tpu.ops.tridiag import tridiag_matvec, tridiag_solve
from acmpc_tpu.ops.tridiag_sharded import tridiag_solve_sharded
from acmpc_tpu.qp.admm import ADMMConfig
from acmpc_tpu.qp.speed_profile import (
    SpeedProfileConstraints,
    solve_speed_profile,
    solve_speed_profile_admm,
    solve_speed_profile_admm_sharded,
    solve_speed_profile_sharded,
)

CONS = SpeedProfileConstraints(
    v_min=5.0, v_max=30.0, a_min=-3.0, a_max=6.0,
    ay_max=5.5, ki_min=0.005, end_velocity=10.0,
)


def _mesh():
    return Mesh(np.array(jax.devices()[:8]), ("x",))


def _dd_tridiag(rng, n, batch=None):
    shape = (n,) if batch is None else (batch, n)
    off = rng.uniform(-1, 1, shape).astype(np.float32)
    diag = (
        np.abs(off)
        + np.abs(np.roll(off, 1, axis=-1))
        + rng.uniform(1.0, 2.0, shape).astype(np.float32)
    )
    sub = np.roll(off, 1, axis=-1)
    sub[..., 0] = 0.0
    sup = off.copy()
    sup[..., -1] = 0.0
    rhs = rng.normal(size=shape).astype(np.float32)
    return sub, diag, sup, rhs


@pytest.mark.parametrize("n", [1024, 1000 * 8])
def test_tridiag_sharded_matches_pcr(n):
    rng = np.random.default_rng(0)
    sub, diag, sup, rhs = _dd_tridiag(rng, n)
    mesh = _mesh()
    f = jax.jit(
        jax.shard_map(
            lambda a, b, c, d: tridiag_solve_sharded(a, b, c, d, "x"),
            mesh=mesh, in_specs=(P("x"),) * 4, out_specs=P("x"),
            check_vma=False,
        )
    )
    x_sh = np.asarray(f(*(jnp.asarray(v) for v in (sub, diag, sup, rhs))))
    x_ref = np.asarray(
        tridiag_solve(*(jnp.asarray(v) for v in (sub, diag, sup, rhs)))
    )
    np.testing.assert_allclose(x_sh, x_ref, atol=5e-6)
    res = np.asarray(
        tridiag_matvec(
            jnp.asarray(sub), jnp.asarray(diag), jnp.asarray(sup),
            jnp.asarray(x_sh),
        )
    ) - rhs
    assert np.abs(res).max() < 5e-5


def test_tridiag_sharded_batched():
    rng = np.random.default_rng(3)
    sub, diag, sup, rhs = _dd_tridiag(rng, 512, batch=3)
    mesh = _mesh()
    f = jax.jit(
        jax.shard_map(
            lambda a, b, c, d: tridiag_solve_sharded(a, b, c, d, "x"),
            mesh=mesh, in_specs=(P(None, "x"),) * 4,
            out_specs=P(None, "x"), check_vma=False,
        )
    )
    x_sh = np.asarray(f(*(jnp.asarray(v) for v in (sub, diag, sup, rhs))))
    x_ref = np.asarray(
        tridiag_solve(*(jnp.asarray(v) for v in (sub, diag, sup, rhs)))
    )
    np.testing.assert_allclose(x_sh, x_ref, atol=5e-6)


def _track(n, seed=1):
    rng = np.random.default_rng(seed)
    theta = np.linspace(0, 2 * np.pi, n, endpoint=False)
    kappas = (0.02 * np.sin(3 * theta) + 0.015 * np.sin(7 * theta)).astype(
        np.float32
    )
    ds = rng.uniform(1.5, 3.0, n).astype(np.float32)
    return ds, kappas


def test_sharded_exact_scan_bitwise():
    """The sharded (min,+) scan must be BIT-IDENTICAL to the single-device
    scan: same combine operations, just grouped per block."""
    ds, kappas = _track(4096)
    ref = solve_speed_profile(
        jnp.asarray(ds), jnp.asarray(kappas), CONS, v_max_runtime=28.0
    )
    mesh = _mesh()
    f = jax.jit(
        jax.shard_map(
            # 4096 divides the mesh exactly, so the end-velocity pin is
            # safe to enable (it defaults OFF for padded callers)
            lambda d, k: solve_speed_profile_sharded(
                d, k, CONS, "x", v_max_runtime=28.0, use_end_velocity=True
            ),
            mesh=mesh, in_specs=(P("x"), P("x")), out_specs=P("x"),
            check_vma=False,
        )
    )
    v_sh = np.asarray(f(jnp.asarray(ds), jnp.asarray(kappas)))
    np.testing.assert_array_equal(v_sh, np.asarray(ref.velocities))
    assert v_sh[-1] == pytest.approx(10.0)  # end-velocity pin on last slab


def test_sharded_admm_matches_unsharded():
    ds, kappas = _track(2048)
    cfg = ADMMConfig(max_iter=20000)
    ref = jax.jit(
        lambda d, k: solve_speed_profile_admm(
            d, k, CONS, v_max_runtime=28.0, cfg=cfg
        )
    )(jnp.asarray(ds), jnp.asarray(kappas))
    assert int(ref.status) == 1
    mesh = _mesh()
    out_specs = type(ref)(
        velocities=P("x"), status=P(), iterations=P(), r_prim=P(), r_dual=P()
    )
    f = jax.jit(
        jax.shard_map(
            lambda d, k: solve_speed_profile_admm_sharded(
                d, k, CONS, "x", v_max_runtime=28.0, cfg=cfg
            ),
            mesh=mesh, in_specs=(P("x"), P("x")), out_specs=out_specs,
            check_vma=False,
        )
    )
    sh = f(jnp.asarray(ds), jnp.asarray(kappas))
    assert int(sh.status) == 1
    # same iteration count: the convergence decision is pmax-combined,
    # so every device sees the single-device trajectory (up to fp32)
    assert int(sh.iterations) == int(ref.iterations)
    np.testing.assert_allclose(
        np.asarray(sh.velocities), np.asarray(ref.velocities),
        rtol=1e-3, atol=2e-3,
    )


def test_map_speed_profile_mesh_entry():
    """SpatialMPC.compute_map_speed_profile(mesh=...) — the production
    startup path — equals the single-device profile on a non-multiple
    point count (exercises padding)."""
    from acmpc_tpu.geometry.path import construct_waypoints
    from acmpc_tpu.dynamics import SpatialBicycleModel, VehicleParams
    from acmpc_tpu.mpc.spatial_mpc import MPCConfig, SpatialMPC

    config = MPCConfig(
        horizon=30,
        step_cost=(4.0e-3, 5.0e-2, 0.0),
        r_term=(1.0e-2, 10.0),
        final_cost=(1.0, 0.0, 0.1),
        constraints=CONS,
    )
    model = SpatialBicycleModel(
        vehicle=VehicleParams(), min_velocity=5.0, max_velocity=30.0
    )
    mpc = SpatialMPC(config, model)

    n_pts = 3001  # not a multiple of 8
    theta = np.linspace(0.0, 2.0 * np.pi, n_pts + 1)
    r = 800.0 + 90.0 * np.sin(3 * theta)
    coords = np.stack(
        [r * np.cos(theta), r * np.sin(theta), np.full_like(theta, 9.0)],
        axis=1,
    )
    path = construct_waypoints(jnp.asarray(coords, jnp.float32))

    single = mpc.compute_map_speed_profile(path, ay_max=7.0, a_min=-0.15)
    sharded = mpc.compute_map_speed_profile(
        path, ay_max=7.0, a_min=-0.15, mesh=_mesh()
    )
    np.testing.assert_array_equal(
        np.asarray(sharded.velocities), np.asarray(single.velocities)
    )
