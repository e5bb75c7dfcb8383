"""Parity against the reference's own numerics.

Unlike the golden fixtures (self-generated regression guards), these tests
execute the reference's actual code (/root/reference/src/acmpc/control/*,
imported in place via tools/reference_bridge.py with osqp/loguru stubbed)
and compare element-wise:

1. waypoint construction (spatial_mpc.py:125-154)     vs geometry/path.py
2. linearise / t2s / s2t (dynamics.py:23-103)         vs dynamics/spatial_bicycle.py
3. speed-QP bounds + fp64-oracle solution
   (solvers/speed_profile.py:26-56)                   vs qp/speed_profile.py
4. control-QP matrices P, q, A, l, u — assembled by the reference's own
   scipy.sparse code (solvers/control.py:26-79,121-158) vs mpc/control_qp.py
5. control solution: reference matrices solved to 1e-8 in fp64
   (tools/cpu_osqp.py) vs this repo's fp32 ADMM engine
6. end-to-end get_control across ALL 7 shipped track configs

Any drift in any formula fails here against the reference itself, not
against our own outputs.
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np
import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(ROOT / "tools") not in sys.path:
    sys.path.insert(0, str(ROOT / "tools"))

from reference_bridge import (  # noqa: E402
    build_reference_mpc,
    reference_available,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="/root/reference not mounted"
)

HORIZON = 50
ALL_TRACKS = [
    "monza",
    "spa",
    "silverstone",
    "nordschleife",
    "vallelunga",
    "bathurst",
    "yas_marina",
]
WINDOW_NAMES = ["curve", "straight", "chicane", "hairpin_r60"]


def _windows():
    from acmpc_tpu.geometry.tracks import (
        get_chicane_track,
        get_curved_track,
        get_hairpin_track,
        get_straight_track,
        with_widths,
    )

    return {
        "curve": with_widths(get_curved_track(0.002, HORIZON, angle=-np.pi / 2)),
        "straight": with_widths(get_straight_track(200.0, HORIZON)),
        "chicane": with_widths(get_chicane_track(40.0, 10.0, HORIZON)),
        "hairpin_r60": with_widths(get_hairpin_track(60.0, HORIZON)),
    }


@pytest.fixture(scope="module")
def windows():
    return _windows()


def _load_cfg(track):
    from acmpc_tpu.config import load_config

    return load_config(ROOT / "configs" / f"{track}.yaml")


@pytest.fixture(scope="module")
def monza_pair():
    """(reference SpatialMPC, our SpatialMPC, config) on the monza YAML."""
    cfg = _load_cfg("monza")
    ref_mpc, _ = build_reference_mpc(cfg.racing_control, cfg.vehicle)
    return ref_mpc, _our_mpc(cfg), cfg


def _our_mpc(cfg):
    from acmpc_tpu.dynamics import SpatialBicycleModel
    from acmpc_tpu.mpc.spatial_mpc import SpatialMPC

    model = SpatialBicycleModel(
        vehicle=cfg.vehicle,
        min_velocity=cfg.racing_control.constraints.v_min,
        max_velocity=cfg.racing_control.constraints.v_max,
    )
    return SpatialMPC(cfg.racing_control, model)


def _ref_speed_path(ref_mpc, window):
    """Reference waypoints with the reference speed profile filled in."""
    path = ref_mpc.construct_waypoints(window.copy())
    end_vel = ref_mpc.speed_profile_constraints["end_velocity"]
    path = ref_mpc.compute_speed_profile(path, False, end_vel=end_vel)
    return path


def _our_path_like(ref_path):
    """Our ReferencePath pytree carrying the reference's waypoint values —
    isolates downstream parity from upstream fp32 rounding."""
    import jax.numpy as jnp

    from acmpc_tpu.geometry.path import ReferencePath

    return ReferencePath(
        xs=jnp.asarray(ref_path.xs, jnp.float32),
        ys=jnp.asarray(ref_path.ys, jnp.float32),
        psis=jnp.asarray(ref_path.psis, jnp.float32),
        kappas=jnp.asarray(ref_path.kappas, jnp.float32),
        distances=jnp.asarray(ref_path.distances, jnp.float32),
        widths=jnp.asarray(ref_path.widths, jnp.float32),
        velocities=jnp.asarray(ref_path.velocities, jnp.float32),
    )


# ---------------------------------------------------------------------------
# 1. waypoint construction
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("name", WINDOW_NAMES)
def test_construct_waypoints_parity(monza_pair, windows, name):
    from acmpc_tpu.geometry.path import construct_waypoints

    ref_mpc, _, _ = monza_pair
    window = windows[name]
    ref_path = ref_mpc.construct_waypoints(window.copy())
    ours = construct_waypoints(np.asarray(window, np.float32))

    np.testing.assert_allclose(ours.xs, ref_path.xs, rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(ours.ys, ref_path.ys, rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(ours.psis, ref_path.psis, rtol=1e-5, atol=2e-5)
    np.testing.assert_allclose(
        ours.distances, ref_path.distances, rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(ours.widths, ref_path.widths, rtol=1e-6, atol=0)
    np.testing.assert_allclose(
        ours.kappas, ref_path.kappas, rtol=1e-4, atol=5e-5
    )


# ---------------------------------------------------------------------------
# 2. dynamics transforms
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("name", WINDOW_NAMES)
def test_linearise_parity(monza_pair, windows, name):
    from acmpc_tpu.dynamics.spatial_bicycle import linearise

    ref_mpc, _, _ = monza_pair
    ref_path = _ref_speed_path(ref_mpc, windows[name])
    f_ref, A_ref, B_ref = ref_mpc.model.linearise(ref_path)

    # time_mode="reference" reproduces the reference's 1/(v ds) time-row
    # coefficients exactly; the framework default "exact" fixes their
    # dimensional error (see linearise docstring).
    f, A, B = linearise(_our_path_like(ref_path), time_mode="reference")
    np.testing.assert_allclose(np.asarray(A), A_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(B), B_ref, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(f), f_ref, rtol=1e-5, atol=1e-7)


def test_t2s_s2t_parity(monza_pair, windows):
    import jax.numpy as jnp

    from acmpc_tpu.dynamics.spatial_bicycle import s2t, t2s

    ref_mpc, _, _ = monza_pair
    ref_path = _ref_speed_path(ref_mpc, windows["chicane"])

    state = np.array([0.35, 0.0, np.pi / 2])
    ref_sp = ref_mpc.model.t2s(ref_path.get_state(0), state)
    ours_sp = t2s(
        jnp.asarray(ref_path.get_state(0), jnp.float32),
        jnp.asarray(state, jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(ours_sp), ref_sp, rtol=1e-5, atol=1e-6)

    rng = np.random.default_rng(0)
    spatial_states = rng.normal(size=(len(ref_path), 3)) * [0.5, 0.1, 1.0]
    ref_t = ref_mpc.model.s2t(ref_path, spatial_states)
    ours_t = s2t(
        _our_path_like(ref_path), jnp.asarray(spatial_states, jnp.float32)
    )
    np.testing.assert_allclose(np.asarray(ours_t), ref_t, rtol=1e-5, atol=1e-4)


# ---------------------------------------------------------------------------
# 3. speed profile: bounds + fp64-oracle solution
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("name", WINDOW_NAMES)
def test_speed_profile_parity(monza_pair, windows, name):
    import jax.numpy as jnp
    from cpu_osqp import solve_qp_fp64

    from acmpc_tpu.qp.speed_profile import (
        solve_speed_profile,
        velocity_upper_bounds,
    )

    ref_mpc, ours_mpc, cfg = monza_pair
    window = windows[name]
    ref_path = ref_mpc.construct_waypoints(window.copy())
    end_vel = ref_mpc.speed_profile_constraints["end_velocity"]

    # bound construction parity (reference speed_profile.py:26-45)
    sps = ref_mpc._speed_profile_solver
    sps._update_velocity_bounds(ref_path, end_vel)
    ref_bounds = sps._max_velocities
    ours_bounds = velocity_upper_bounds(
        jnp.asarray(ref_path.kappas, jnp.float32),
        cfg.racing_control.constraints,
        cfg.racing_control.constraints.v_max,
        end_vel,
    )
    np.testing.assert_allclose(
        np.asarray(ours_bounds), ref_bounds, rtol=1e-4, atol=1e-3
    )

    # solution parity: reference-assembled QP solved to 1e-9 in fp64 vs
    # our exact (min,+) scan solve
    sps._update_problem_bounds()
    sps._update_inequalities(ref_path)
    sps._update_costs()
    oracle = solve_qp_fp64(
        sps._P, sps._q, sps._A, sps._lower_bounds, sps._upper_bounds, eps=1e-9
    )
    assert oracle.info.status == "solved"

    sol = solve_speed_profile(
        jnp.asarray(ref_path.distances, jnp.float32),
        jnp.asarray(ref_path.kappas, jnp.float32),
        cfg.racing_control.constraints,
    )
    assert int(sol.status) == 1
    np.testing.assert_allclose(
        np.asarray(sol.velocities), oracle.x, rtol=1e-4, atol=5e-3
    )


# ---------------------------------------------------------------------------
# 4. control-QP matrix assembly
# ---------------------------------------------------------------------------
def _ref_control_matrices(ref_mpc, ref_path, spatial_state):
    cs = ref_mpc._control_solver
    cs._update_references(ref_path)
    cs._update_inequalities()
    cs._update_problem_bounds(spatial_state, ref_path)
    cs._update_costs()
    P = cs._P.toarray()
    A = cs._A.toarray()
    l = np.clip(cs._lower_bounds, -1e30, 1e30)  # noqa: E741
    u = np.clip(cs._upper_bounds, -1e30, 1e30)
    return P, cs._q.copy(), A, l, u


def _our_control_matrices(ours_mpc, ref_path, spatial_state):
    import jax.numpy as jnp

    from acmpc_tpu.mpc.control_qp import assemble_control_qp

    cfgc = ours_mpc.config
    P, q, A, l, u = assemble_control_qp(  # noqa: E741
        _our_path_like(ref_path),
        jnp.asarray(spatial_state, jnp.float32),
        ours_mpc.model,
        jnp.asarray(cfgc.step_cost, jnp.float32),
        jnp.asarray(cfgc.r_term, jnp.float32),
        jnp.asarray(cfgc.final_cost, jnp.float32),
        time_mode="reference",
    )
    return tuple(np.asarray(m) for m in (P, q, A, l, u))


@pytest.mark.parametrize("track", ["monza", "nordschleife"])
@pytest.mark.parametrize("name", ["chicane", "hairpin_r60"])
def test_control_qp_matrix_parity(windows, track, name):
    cfg = _load_cfg(track)
    ref_mpc, _ = build_reference_mpc(cfg.racing_control, cfg.vehicle)
    ours_mpc = _our_mpc(cfg)

    ref_path = _ref_speed_path(ref_mpc, windows[name])
    state = np.array([0.0, 0.0, np.pi / 2])
    spatial_state = ref_mpc.model.t2s(ref_path.get_state(0), state)

    P_r, q_r, A_r, l_r, u_r = _ref_control_matrices(
        ref_mpc, ref_path, spatial_state
    )
    P_o, q_o, A_o, l_o, u_o = _our_control_matrices(
        ours_mpc, ref_path, spatial_state
    )

    assert P_o.shape == P_r.shape and A_o.shape == A_r.shape
    np.testing.assert_allclose(P_o, P_r, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(q_o, q_r, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(A_o, A_r, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(l_o, l_r, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(u_o, u_r, rtol=1e-4, atol=1e-3)


# ---------------------------------------------------------------------------
# 5. control solution vs fp64 oracle on the reference's exact matrices
# ---------------------------------------------------------------------------
def _extract_controls(x, horizon, wheelbase):
    """Reference command extraction (spatial_mpc.py:193-200)."""
    sig = np.array(x[-(horizon - 1) * 2 :], np.float64).copy()
    velocities = sig[0::2]
    deltas = np.arctan(sig[1::2] * wheelbase)
    return velocities, deltas


@pytest.mark.parametrize("track", ALL_TRACKS)
def test_control_solution_parity(windows, track):
    import dataclasses

    import jax.numpy as jnp
    from cpu_osqp import solve_qp_fp64

    from acmpc_tpu.qp.admm import solve_box_qp

    cfg = _load_cfg(track)
    ref_mpc, _ = build_reference_mpc(cfg.racing_control, cfg.vehicle)
    ours_mpc = _our_mpc(cfg)
    window = windows["chicane"]

    ref_path = _ref_speed_path(ref_mpc, window)
    state = np.array([0.0, 0.0, np.pi / 2])
    spatial_state = ref_mpc.model.t2s(ref_path.get_state(0), state)

    P_r, q_r, A_r, l_r, u_r = _ref_control_matrices(
        ref_mpc, ref_path, spatial_state
    )
    qp = _our_control_matrices(ours_mpc, ref_path, spatial_state)

    # The reference QP is *always* mildly primal-infeasible by
    # construction: the first equality block pins t_0 = 0
    # (control.py:67, spatial_state[2] = 0 from t2s) while the box row
    # demands t_0 >= 0.01 (control.py:134) — a 0.01 conflict OSQP absorbs
    # because its relative tolerance scales with |z| ~ v_max (~1e2). Our
    # engine reproduces that behaviour at matched tolerances
    # (test_get_control_parity_all_configs); for THIS tight-eps oracle
    # comparison the conflicting bound is relaxed in BOTH matrix sets so
    # the problems are exactly feasible.
    n_eq = 3 * HORIZON
    assert l_r[n_eq + 2] == 0.01 and qp[3][n_eq + 2] == np.float32(0.01)
    l_r = l_r.copy()
    l_r[n_eq + 2] = 0.0
    l_o = qp[3].copy()
    l_o[n_eq + 2] = 0.0
    qp = (qp[0], qp[1], qp[2], l_o, qp[4])

    oracle = solve_qp_fp64(P_r, q_r, A_r, l_r, u_r, eps=1e-8)
    assert oracle.info.status == "solved", f"{track}: oracle {oracle.info.status}"
    # eps 1e-4 (10x tighter than the reference's OSQP defaults): on the
    # degenerate active-t-face QPs the primal residual stalls at ~1e-3
    # exactly as unpolished OSQP-family ADMM does, while every
    # well-determined solution component is already at ~1e-5 accuracy.
    tight = dataclasses.replace(
        ours_mpc.admm,
        eps_abs=1e-4,
        eps_rel=1e-4,
        max_iter=20000,
        adaptive_rho=True,
        fixed_iterations=None,
    )
    sol = solve_box_qp(*(jnp.asarray(m) for m in qp), tight)
    assert int(sol.status) == 1, f"{track}: ours status={int(sol.status)}"

    L = cfg.vehicle.wheelbase
    v_ref, d_ref = _extract_controls(oracle.x, HORIZON, L)
    v_ours, d_ours = _extract_controls(np.asarray(sol.x), HORIZON, L)
    # Degenerate v_0 direction: when any time-state lower bound t_k >= 0.01
    # (reference control.py:134) is active at the exact optimum, v_0 couples
    # to it only through the ~1e-4 linearised time-row coefficient
    # (dynamics.py:65-103), i.e. the (v_0, t-chain) direction has effective
    # curvature ~R_v with constraint coupling ~1e-4 — ADMM without polish
    # (the reference runs OSQP with polish OFF at eps 1e-3) leaves v_0
    # anywhere between the exact optimum and the cost-reference velocity
    # v_ref_0 = path.velocities[0]. Our engine reproduces that ADMM-family
    # behaviour; the polished fp64 oracle pins the exact optimum. Assert
    # v_0 within that optimal-face interval, everything else tightly.
    t_states = oracle.x[2 : 3 * HORIZON : 3]
    degenerate = bool((np.abs(t_states[1:] - 0.01) < 1e-4).any())
    if degenerate:
        vref0 = float(ref_path.velocities[0])
        lo = min(v_ref[0], vref0) - 0.5
        hi = max(v_ref[0], vref0) + 0.5
        assert lo <= v_ours[0] <= hi, (
            f"{track}: degenerate v_0={v_ours[0]} outside [{lo}, {hi}]"
        )
        np.testing.assert_allclose(v_ours[1:], v_ref[1:], rtol=2e-3, atol=5e-2)
    else:
        np.testing.assert_allclose(v_ours, v_ref, rtol=2e-3, atol=5e-2)
    np.testing.assert_allclose(d_ours, d_ref, rtol=0, atol=2e-3)
    # predicted time states drive command scheduling — check them too.
    # In the degenerate case the whole t-chain carries the v_0-coupled
    # offset, but the per-step increments (what command scheduling actually
    # consumes) are fixed by v_1.. — compare increments there.
    t_ref = np.asarray(oracle.x[: (HORIZON - 1) * 3]).reshape(-1, 3)[:, 2]
    t_ours = np.asarray(sol.x[: (HORIZON - 1) * 3]).reshape(-1, 3)[:, 2]
    if degenerate:
        np.testing.assert_allclose(
            np.diff(t_ours)[1:], np.diff(t_ref)[1:], rtol=5e-3, atol=5e-3
        )
    else:
        np.testing.assert_allclose(t_ours, t_ref, rtol=5e-3, atol=5e-3)


# ---------------------------------------------------------------------------
# 6. end-to-end get_control parity on all 7 shipped configs
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("track", ALL_TRACKS)
def test_get_control_parity_all_configs(windows, track):
    import jax.numpy as jnp

    cfg = _load_cfg(track)
    ref_mpc, _ = build_reference_mpc(cfg.racing_control, cfg.vehicle)
    ours_mpc = _our_mpc(cfg)

    for name in ("curve", "chicane"):
        window = windows[name]
        ref_mpc.get_control(window.copy())
        assert ref_mpc.infeasibility_counter == 0, f"{track}/{name}: ref infeasible"

        state, _ = ours_mpc.jitted_get_control(
            ours_mpc.initial_state(), jnp.asarray(window, jnp.float32)
        )
        assert bool(state.solved), f"{track}/{name}: ours infeasible"

        v_ref, d_ref = ref_mpc.projected_control
        v_ours = np.asarray(state.projected_control[0])
        d_ours = np.asarray(state.projected_control[1])
        # both stacks solve to OSQP's default 1e-3 tolerance -> commands
        # agree to ~1e-2; steering to a few millirad
        np.testing.assert_allclose(v_ours, v_ref, rtol=5e-3, atol=0.15)
        np.testing.assert_allclose(d_ours, d_ref, rtol=0, atol=5e-3)
        # cum_time: ours is real seconds (dt = ds/v); the reference's
        # time row is 1/(v ds) (dynamics.py:84-101) — each stage-k
        # increment differs by exactly ds_k^2. Convert the reference's
        # increments to seconds and compare (test_linearise_parity covers
        # the raw coefficients under time_mode="reference").
        path = ours_mpc.construct_waypoints(jnp.asarray(window, jnp.float32))
        ds = np.asarray(path.distances)
        t_ref = np.asarray(ref_mpc.cum_time)
        dt_ref = np.diff(t_ref, prepend=t_ref[:1] * 0.0)
        t_ref_seconds = np.cumsum(
            np.concatenate([t_ref[:1], dt_ref[1:] * ds[: t_ref.size - 1] ** 2])
        )
        np.testing.assert_allclose(
            np.asarray(state.cum_time), t_ref_seconds, rtol=2e-2, atol=2e-2
        )
