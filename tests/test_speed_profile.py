import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acmpc_tpu.geometry.path import construct_waypoints
from acmpc_tpu.geometry.tracks import get_hairpin_track, get_straight_track, with_widths
from acmpc_tpu.qp.admm import ADMMConfig
from acmpc_tpu.qp.speed_profile import (
    SpeedProfileConstraints,
    solve_speed_profile,
    velocity_upper_bounds,
)

CONSTRAINTS = SpeedProfileConstraints(
    v_min=5.0, v_max=30.0, a_min=-3.0, a_max=6.0,
    ay_max=5.5, ki_min=0.005, end_velocity=10.0,
)


def _path(track):
    return construct_waypoints(jnp.asarray(with_widths(track), jnp.float32))


def test_straight_track_reaches_vmax():
    path = _path(get_straight_track(400.0, 80))
    sol = jax.jit(
        lambda d, k: solve_speed_profile(d, k, CONSTRAINTS)
    )(path.distances, path.kappas)
    assert int(sol.status) == 1
    v = np.asarray(sol.velocities)
    # straight: curvature below ki_min -> ceiling is v_max (+2 headroom)
    assert v.max() >= CONSTRAINTS.v_max - 0.5
    # terminal velocity respected
    assert v[-1] <= CONSTRAINTS.end_velocity + 0.5


def test_hairpin_capped_by_lateral_acceleration():
    radius = 20.0
    path = _path(get_hairpin_track(radius, 80))
    sol = jax.jit(
        lambda d, k: solve_speed_profile(d, k, CONSTRAINTS)
    )(path.distances, path.kappas)
    assert int(sol.status) == 1
    v = np.asarray(sol.velocities)
    v_cap = np.sqrt(CONSTRAINTS.ay_max * radius) + 2.0
    assert v[5:-5].max() <= v_cap + 0.5


def test_acceleration_limits_hold():
    path = _path(get_hairpin_track(30.0, 60))
    sol = jax.jit(
        lambda d, k: solve_speed_profile(d, k, CONSTRAINTS)
    )(path.distances, path.kappas)
    v = np.asarray(sol.velocities)
    d = np.asarray(path.distances)[:-1]
    acc = (v[1:] - v[:-1]) / (2 * d)
    tol = 5e-2
    assert acc.max() <= CONSTRAINTS.a_max + tol
    assert acc.min() >= CONSTRAINTS.a_min - tol


def test_localised_variant_ignores_curvature():
    path = _path(get_hairpin_track(20.0, 60))
    sol = jax.jit(
        lambda d, k: solve_speed_profile(
            d, k, CONSTRAINTS, v_max_runtime=25.0, localised=True
        )
    )(path.distances, path.kappas)
    assert int(sol.status) == 1
    v = np.asarray(sol.velocities)
    # flat ceiling: no curvature cap, profile pushes to the runtime v_max
    assert v.max() > np.sqrt(CONSTRAINTS.ay_max * 20.0) + 2.5


def test_map_scale_profile():
    """Full-map-sized banded QP (the 40k-iteration startup solve)."""
    theta = np.linspace(0, 2 * np.pi, 4000, endpoint=False)
    r = 300.0 + 50.0 * np.sin(3 * theta)
    xy = np.stack([r * np.cos(theta), r * np.sin(theta)])
    path = _path(xy)
    sol = jax.jit(
        lambda d, k: solve_speed_profile(
            d, k, CONSTRAINTS, use_end_velocity=False,
            cfg=ADMMConfig(max_iter=40000),
        )
    )(path.distances, path.kappas)
    assert int(sol.status) == 1
    v = np.asarray(sol.velocities)
    assert v.shape == (3999,)
    assert (v >= CONSTRAINTS.v_min - 0.1).all()


def test_matches_scipy_reference():
    from scipy.optimize import LinearConstraint, minimize

    path = _path(get_hairpin_track(35.0, 25))
    n = path.n_points
    sol = jax.jit(
        lambda d, k: solve_speed_profile(d, k, CONSTRAINTS)
    )(path.distances, path.kappas)
    assert int(sol.status) == 1

    d = np.asarray(path.distances, np.float64)
    k = np.asarray(path.kappas, np.float64)
    v_hi = np.asarray(
        velocity_upper_bounds(
            path.kappas, CONSTRAINTS,
            jnp.float32(CONSTRAINTS.v_max), CONSTRAINTS.end_velocity,
        ),
        np.float64,
    )
    D1 = np.zeros((n - 1, n))
    inv2d = 1.0 / (2 * d[: n - 1])
    D1[np.arange(n - 1), np.arange(n - 1)] = -inv2d
    D1 = D1 + np.diag(inv2d, 1)[: n - 1]
    A = np.vstack([D1, np.eye(n)])
    lo = np.concatenate([np.full(n - 1, CONSTRAINTS.a_min), np.full(n, CONSTRAINTS.v_min)])
    hi = np.concatenate([np.full(n - 1, CONSTRAINTS.a_max), v_hi])
    res = minimize(
        lambda x: 0.5 * x @ x - v_hi @ x,
        np.full(n, CONSTRAINTS.v_min),
        jac=lambda x: x - v_hi,
        constraints=[LinearConstraint(A, lo, hi)],
        method="trust-constr",
        options={"maxiter": 2000, "gtol": 1e-10},
    )
    np.testing.assert_allclose(
        np.asarray(sol.velocities), res.x, rtol=2e-2, atol=5e-2
    )


def test_scan_matches_admm():
    """Exact (min,+)-scan solution vs the independent ADMM solver."""
    from acmpc_tpu.qp.speed_profile import solve_speed_profile_admm

    for radius, n in [(25.0, 40), (60.0, 80)]:
        path = _path(get_hairpin_track(radius, n))
        exact = jax.jit(
            lambda d, k: solve_speed_profile(d, k, CONSTRAINTS)
        )(path.distances, path.kappas)
        admm = jax.jit(
            lambda d, k: solve_speed_profile_admm(d, k, CONSTRAINTS)
        )(path.distances, path.kappas)
        assert int(exact.status) == 1 and int(admm.status) == 1
        np.testing.assert_allclose(
            np.asarray(exact.velocities),
            np.asarray(admm.velocities),
            rtol=5e-3,
            atol=2e-2,
        )
