import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acmpc_tpu.dynamics import SpatialBicycleModel, VehicleParams
from acmpc_tpu.geometry.tracks import (
    get_chicane_track,
    get_hairpin_track,
    get_straight_track,
    with_widths,
)
from acmpc_tpu.mpc.spatial_mpc import MPCConfig, SpatialMPC
from acmpc_tpu.qp.speed_profile import SpeedProfileConstraints

CONSTRAINTS = SpeedProfileConstraints(
    v_min=5.0,
    v_max=30.0,
    a_min=-3.0,
    a_max=6.0,
    ay_max=5.5,
    ki_min=0.005,
    end_velocity=10.0,
)

# monza-like racing cost structure (configs/monza.yaml:67-84 in reference)
CONFIG = MPCConfig(
    horizon=30,
    step_cost=(4.0e-3, 5.0e-2, 0.0),
    r_term=(1.0e-2, 10.0),
    final_cost=(1.0, 0.0, 0.1),
    constraints=CONSTRAINTS,
)

VEHICLE = VehicleParams()


def make_mpc(config=CONFIG):
    model = SpatialBicycleModel(
        vehicle=VEHICLE,
        min_velocity=config.constraints.v_min,
        max_velocity=config.constraints.v_max,
    )
    return SpatialMPC(config, model)


def run_track(mpc, track_xy):
    ref = jnp.asarray(with_widths(track_xy), jnp.float32)
    state = mpc.initial_state()
    state, diags = mpc.jitted_get_control(state, ref)
    return state, diags


def test_straight_track_drives_straight():
    mpc = make_mpc()
    state, diags = run_track(mpc, get_straight_track(200.0, CONFIG.horizon))
    assert bool(state.solved)
    deltas = np.asarray(state.projected_control[1])
    assert np.abs(deltas).max() < 2e-2, deltas
    vels = np.asarray(state.projected_control[0])
    assert vels.min() > CONSTRAINTS.v_min - 0.5
    assert vels.max() < CONSTRAINTS.v_max + 2.5
    # cumulative time strictly increases along the horizon
    ct = np.asarray(state.cum_time)
    assert (np.diff(ct) > 0).all()


def test_hairpin_steers_at_curvature():
    radius = 25.0
    mpc = make_mpc()
    state, diags = run_track(mpc, get_hairpin_track(radius, CONFIG.horizon))
    assert bool(state.solved)
    deltas = np.asarray(state.projected_control[1])
    expected_delta = np.arctan(VEHICLE.wheelbase / radius)
    # mid-horizon steering should match the constant track curvature
    mid = deltas[5:-5]
    assert np.abs(np.abs(mid).mean() - expected_delta) < 0.35 * expected_delta
    # speed limited by lateral acceleration: v ~ sqrt(ay_max * R)
    vels = np.asarray(state.projected_control[0])
    v_cap = np.sqrt(CONSTRAINTS.ay_max * radius) + 2.5
    assert vels[2:-2].max() <= v_cap + 1.0


def test_prediction_stays_near_track():
    mpc = make_mpc()
    track = get_chicane_track(40.0, 10.0, CONFIG.horizon)
    state, _ = run_track(mpc, track)
    assert bool(state.solved)
    pred = np.asarray(state.prediction)
    track_pts = track.T[: CONFIG.horizon - 1]
    dists = np.linalg.norm(pred - track_pts, axis=1)
    assert dists.max() < 6.0  # within the drivable corridor


def test_infeasible_keeps_previous_commands():
    import dataclasses

    cfg = dataclasses.replace(CONFIG, max_iterations=25)
    mpc = make_mpc(cfg)
    # first, a good solve with the full-iteration MPC
    good = make_mpc()
    state, _ = run_track(good, get_straight_track(200.0, CONFIG.horizon))
    prev_control = np.asarray(state.projected_control)
    # now run the crippled solver from that carry: it must keep commands
    ref = jnp.asarray(
        with_widths(get_hairpin_track(8.0, CONFIG.horizon)), jnp.float32
    )
    state2, diags = mpc.jitted_get_control(state, ref)
    if not bool(state2.solved):
        np.testing.assert_array_equal(
            np.asarray(state2.projected_control), prev_control
        )
        assert int(state2.infeasibility_counter) == 1


def test_batched_scenarios_match_single():
    mpc = make_mpc()
    tracks = [
        get_straight_track(200.0, CONFIG.horizon),
        get_hairpin_track(25.0, CONFIG.horizon),
        get_chicane_track(40.0, 10.0, CONFIG.horizon),
        get_hairpin_track(40.0, CONFIG.horizon, angle=0.5),
    ]
    refs = jnp.stack([jnp.asarray(with_widths(t), jnp.float32) for t in tracks])
    states = jax.vmap(lambda: mpc.initial_state(), axis_size=len(tracks))()
    bstate, _ = mpc.batched_get_control(states, refs)
    assert bool(bstate.solved.all())
    # batched result equals the single solve for each scenario
    for i, t in enumerate(tracks):
        s, _ = run_track(mpc, t)
        np.testing.assert_allclose(
            np.asarray(bstate.projected_control[i]),
            np.asarray(s.projected_control),
            rtol=2e-3,
            atol=2e-3,
        )


def test_control_qp_matches_scipy_reference():
    """Parity: the full control QP solution vs scipy trust-constr fp64."""
    from scipy.optimize import LinearConstraint, minimize

    from acmpc_tpu.geometry.path import construct_waypoints
    from acmpc_tpu.mpc.control_qp import assemble_control_qp
    from acmpc_tpu.qp.admm import solve_box_qp

    horizon = 12
    mpc = make_mpc(
        MPCConfig(
            horizon=horizon,
            step_cost=CONFIG.step_cost,
            r_term=CONFIG.r_term,
            final_cost=CONFIG.final_cost,
            constraints=CONSTRAINTS,
        )
    )
    ref = jnp.asarray(
        with_widths(get_hairpin_track(30.0, horizon)), jnp.float32
    )
    path = construct_waypoints(ref)
    path = path.replace(velocities=jnp.full(path.n_points, 12.0))
    spatial_state = jnp.asarray([0.0, 0.0, 0.0], jnp.float32)
    P, q, A, l, u = assemble_control_qp(
        path,
        spatial_state,
        mpc.model,
        jnp.asarray(CONFIG.step_cost, jnp.float32),
        jnp.asarray(CONFIG.r_term, jnp.float32),
        jnp.asarray(CONFIG.final_cost, jnp.float32),
    )
    sol = jax.jit(solve_box_qp)(P, q, A, l, u)
    assert int(sol.status) == 1

    Pn = np.asarray(P, np.float64)
    qn = np.asarray(q, np.float64)
    An = np.asarray(A, np.float64)
    ln = np.asarray(l, np.float64)
    un = np.asarray(u, np.float64)
    ln[ln < -1e20] = -np.inf
    un[un > 1e20] = np.inf
    res = minimize(
        lambda x: 0.5 * x @ Pn @ x + qn @ x,
        np.zeros(len(qn)),
        jac=lambda x: Pn @ x + qn,
        constraints=[LinearConstraint(An, ln, un)],
        method="trust-constr",
        options={"maxiter": 3000, "gtol": 1e-10, "xtol": 1e-12},
    )
    # compare extracted controls (the physically meaningful part)
    n = horizon - 1
    ours = np.asarray(sol.x)[-2 * n :]
    ref_x = res.x[-2 * n :]
    np.testing.assert_allclose(ours, ref_x, rtol=5e-2, atol=5e-2)


def test_cum_time_matches_plan_kinematics():
    """cum_time must be real seconds: stage time step == ds / v_plan.

    Guards the extraction-time exact clock (SpatialMPC._extract). The
    QP's internal time state uses the reference's 1/(v ds) units
    (dynamics.py:84-101) — a clock only at 1 m spacing; at 2 m spacing
    the reference's cum_time runs 4x fast and its temporal command
    selector (commands.py:20-38) applies commands planned for stages far
    down the horizon, destabilising the closed loop at speed. The
    published cum_time is instead computed from the solved plan
    kinematics and must match exactly regardless of spacing."""
    mpc = make_mpc()
    spacing = 2.0
    n = mpc.horizon
    track = np.stack([np.zeros(n), np.arange(n) * spacing], axis=0)
    ref = jnp.asarray(with_widths(track), jnp.float32)
    state, _ = mpc.jitted_get_control(mpc.initial_state(), ref)
    assert bool(state.solved)
    v_plan = np.asarray(state.projected_control)[0]
    ct = np.asarray(state.cum_time)
    dt = spacing / v_plan
    expected = np.concatenate([[0.0], np.cumsum(dt[:-1])])
    np.testing.assert_allclose(ct, expected, rtol=1e-4, atol=1e-4)


def test_closed_loop_offset_converges_at_speed():
    """A car 2 m off a dead-straight centreline at racing speed must
    converge to the path under the production command-selection loop —
    the regression that exposed the reference's time-row bug (under its
    convention this diverges: the selector picks counter-steer-tail
    commands and pushes the car off the track)."""
    import dataclasses

    from acmpc_tpu.bench import LapSweep, SweepGrid
    from acmpc_tpu.localise.track_map import TrackMap

    n = 2000
    c = np.stack([np.zeros(n), np.arange(n) * 1.0], axis=1)
    tm = TrackMap(
        centre=jnp.asarray(c, jnp.float32),
        left=jnp.asarray(c + [-4.5, 0], jnp.float32),
        right=jnp.asarray(c + [4.5, 0], jnp.float32),
    )
    config = dataclasses.replace(CONFIG, rti_iterations=80)
    mpc = make_mpc(config)
    sweep = LapSweep(mpc, tm, half_width=4.5, dt=0.1)
    grid = SweepGrid(
        start_index=jnp.array([100], jnp.int32),
        lateral_offset=jnp.array([2.0]),
        v_max=jnp.array([20.0]),
    )
    cars = jax.vmap(sweep._init_car)(grid)
    cars = dataclasses.replace(cars, v=jnp.array([18.0]))
    states = jax.vmap(lambda _: mpc.initial_state())(jnp.arange(1))
    _, i0 = jax.vmap(sweep._ego_window)(cars)
    for _ in range(20):
        cars, states, metrics, i0 = sweep._fused_step(
            cars, states, grid.v_max, i0
        )
    assert float(np.abs(np.asarray(cars.x)[0])) < 0.5, (
        f"car did not converge to centreline: x={float(cars.x[0]):.2f}"
    )
