"""Tests for the offline tooling: localisation benchmark replay, raceline
calculator, Pacejka model, recorder, dashboard rendering, monitors."""

import pathlib

import numpy as np
import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent

from test_localise import make_asymmetric_map, observation_from_pose


def test_benchmark_localisation_replay(tmp_path):
    from acmpc_tpu.config import load_config
    from acmpc_tpu.localise.benchmarking import (
        BenchmarkLocalisation,
        LocalisationRecorder,
    )
    from acmpc_tpu.localise.track_map import save_track_map

    tm = make_asymmetric_map()
    map_path = str(tmp_path / "map.npz")
    save_track_map(map_path, tm.centre, tm.left, tm.right)

    # synthesize a recording by driving the true car
    rec = LocalisationRecorder(str(tmp_path / "rec"))
    centre = np.asarray(tm.centre)
    m = len(centre)
    spacing = float(np.linalg.norm(centre[1] - centre[0]))
    v, dt = 20.0, 0.1
    step_pts = max(1, int(round(v * dt / spacing)))
    t = 0.0
    from acmpc_tpu.dynamics.vehicle import VehicleParams

    veh = VehicleParams()
    for k in range(120):
        i = (40 + k * step_pts) % m
        p0, p1 = centre[i], centre[(i + 1) % m]
        yaw = np.arctan2(p1[1] - p0[1], p1[0] - p0[0])
        pose = np.array([p0[0], p0[1], yaw], np.float32)
        left, right = observation_from_pose(tm, pose)
        rec.record_observation(t, left, right)
        i2 = (i + step_pts) % m
        p2, p3 = centre[i2], centre[(i2 + 1) % m]
        yaw2 = np.arctan2(p3[1] - p2[1], p3[0] - p2[0])
        dyaw = (yaw2 - yaw + np.pi) % (2 * np.pi) - np.pi
        delta = np.arctan(veh.wheelbase * (dyaw / dt) / v)
        steering = -delta / veh.max_steering_angle
        # game_pose layout: [x_game, y, z, yaw] with x negated
        rec.record_control(
            t + dt / 2, (steering, 0.0, v), [-pose[0], 0.0, pose[1], pose[2]]
        )
        t += dt
    rec.save()

    import dataclasses

    cfg = load_config("configs/monza.yaml").localisation
    cfg = dataclasses.replace(
        cfg, threshold_track_limit=4.0, score_sigma=1.0, n_particles=400,
        n_converged_particles=400,
    )
    bench = BenchmarkLocalisation(
        data_path=str(tmp_path / "rec"),
        map_path=map_path,
        localisation_cfg=cfg,
    )
    from acmpc_tpu.localise.benchmarking.visualisation import (
        LocalisationVisualiser,
    )

    vis = LocalisationVisualiser(bench.localiser, bench.tracker)
    summary = bench.run(visualiser=vis)
    assert summary["n_steps"] == 120
    assert summary["n_observations"] == 120
    assert summary["percent_localised"] >= 0.0
    assert np.isfinite(summary["step_p50_ms"])

    # 9-panel benchmark figure (reference visualisation.py:22-39 axes)
    fig_path = tmp_path / "benchmark.png"
    gt = [r["game_pose"][0] for r in bench._recording if "game_pose" in r]
    vis.save_figure(str(fig_path), gt_poses=gt)
    assert fig_path.exists() and fig_path.stat().st_size > 10_000


def test_raceline_cuts_corners():
    from acmpc_tpu.utils.raceline import calculate_raceline, menger_curvature
    import jax.numpy as jnp

    tm = make_asymmetric_map(600)
    centre = np.asarray(tm.centre)
    raceline = calculate_raceline(
        centre, half_width=5.0, margin=0.5
    )
    assert raceline.shape == centre.shape
    # raceline stays inside the corridor
    offsets = np.linalg.norm(raceline - centre, axis=1)
    assert offsets.max() <= 4.6
    # and is smoother than the centreline
    k_centre = np.abs(np.asarray(menger_curvature(jnp.asarray(centre)))).mean()
    k_race = np.abs(np.asarray(menger_curvature(jnp.asarray(raceline)))).mean()
    assert k_race < k_centre


def test_pacejka_straight_line_accelerates():
    from acmpc_tpu.dynamics.pacejka import DynamicBicycleModel

    model = DynamicBicycleModel()
    state = np.array([0.0, 0.0, 0.0, 10.0, 0.0, 0.0])
    controls = np.tile(np.array([0.0, 1.0]), (40, 1))  # full throttle
    traj = np.asarray(model.rollout(state, controls, dt=0.05))
    assert traj[-1, 3] > 10.5  # vx grows
    assert abs(traj[-1, 1]) < 1.0  # stays straight
    # steering curves the trajectory
    controls[:, 0] = 0.1
    traj2 = np.asarray(model.rollout(state, controls, dt=0.05))
    assert abs(traj2[-1, 1]) > 1.0


def test_recorder_writes_samples(tmp_path):
    from acmpc_tpu.recording import DataRecorder

    rec = DataRecorder(str(tmp_path), n_image_samples=3)
    obs = {
        "CameraFrontRGB": np.zeros((32, 32, 3), np.uint8),
        "CameraFrontSegm": np.zeros((32, 32), np.uint8),
        "full_pose": {"velocity": 12.0},
        "tracks": {
            "centre": np.zeros((5, 2)),
            "left": np.zeros((5, 2)),
            "right": np.zeros((5, 2)),
        },
    }
    for _ in range(3):
        rec.maybe_record_data(obs, 0.05, 0.1, 0.5)
    assert not rec.enabled  # capped
    assert (tmp_path / "datacollection" / "commands" / "commands.json").exists()
    assert len(list((tmp_path / "datacollection" / "images").glob("*.png"))) >= 2


def test_dashboard_render_composites():
    from acmpc_tpu.dashboard.render import (
        compose_dashboard,
        render_bev,
        render_semantics,
        render_world_map,
    )

    tm = make_asymmetric_map(300)
    tracks = {
        "left": np.random.uniform(-10, 10, (50, 2)),
        "right": np.random.uniform(-10, 10, (50, 2)),
        "centre": np.random.uniform(-10, 10, (50, 2)),
    }
    bev = render_bev(tracks, np.random.uniform(-10, 10, (20, 2)))
    assert bev.shape == (400, 400, 3)
    world = render_world_map(
        {
            "centre": np.asarray(tm.centre),
            "left": np.asarray(tm.left),
            "right": np.asarray(tm.right),
        },
        np.random.uniform(-100, 100, (100, 3)),
        np.array([0.0, 0.0, 0.0]),
        np.array([10.0, 10.0, 0.0]),
    )
    assert world.shape == (400, 400, 3)
    sem = render_semantics(np.random.randint(0, 10, (64, 64)))
    assert sem.shape == (64, 64, 3)
    frame = compose_dashboard({"bev": bev, "map": world, "sem": sem})
    assert frame.shape[1] == 1280 and frame.ndim == 3


def test_session_tracker_lap_bookkeeping():
    from acmpc_tpu.dashboard.session import SessionTracker, format_time

    st = SessionTracker()
    st.update({"i_current_time": 5000, "completed_laps": 0})
    st.update({"i_current_time": 100, "completed_laps": 1, "i_last_time": 90000})
    st.update({"i_current_time": 100, "completed_laps": 2, "i_last_time": 85000})
    snap = st.snapshot()
    assert snap["completed_laps"] == 2
    assert snap["best_lap"] == "01:25.000"
    assert snap["laps"][-1]["colour"] == "purple"  # improved
    assert format_time(61500) == "01:01.500"
    assert format_time(0) == "--:--.---"


def test_system_monitor_percentiles():
    from acmpc_tpu.utils.monitor import SystemMonitor, track_runtime

    mon = SystemMonitor()

    @track_runtime(mon)
    def work():
        return 42

    for _ in range(10):
        assert work() == 42
    s = mon.summary("test_system_monitor_percentiles.<locals>.work")
    assert s["n"] == 10
    assert s["p99_ms"] >= s["p50_ms"] >= 0


def test_build_synth_track_pipeline(tmp_path):
    """The synthetic-circuit generator drives the REAL mapping pipeline
    (MapMaker.process_segmentation_tracks -> save_map) and the shipped
    map must stay within boundary error of the ground-truth centreline
    (reference builds its shipped maps the same way: map_maker.py:132-225)."""
    import sys

    sys.path.insert(0, str(ROOT / "tools"))
    from build_synth_track import (
        boundaries,
        drive_mapping_pipeline,
        generate_centreline,
    )
    from scipy.spatial import cKDTree

    centre, _ = generate_centreline(2000.0, seed=3)
    # closed circuit: endpoint gap below one step
    assert np.linalg.norm(centre[-1] - centre[0]) < 4.0
    left, right = boundaries(centre)
    out = tmp_path / "synth.npy"
    built = drive_mapping_pipeline(centre, left, right, str(out))
    assert len(built["centre_track"]) > 1000
    d, _ = cKDTree(centre).query(built["centre_track"])
    assert np.median(d) < 1.0  # built centre hugs ground truth
    assert np.percentile(d, 95) < 3.0
    # the built map loads through the production loader
    from acmpc_tpu.localise.track_map import load_track_map

    tm = load_track_map(out)
    assert tm.centre.shape[0] == len(built["centre_track"])


def test_full_lap_smoke():
    """2-scenario, few-dozen-step smoke of the endurance sweep
    (tools/full_lap.py, BASELINE config 5) — both the centreline group
    and the raceline + shipped-speed-profile group (BASELINE config 1's
    full wording), so the FULL_LAP.json artifact stays reproducible."""
    import sys

    sys.path.insert(0, str(ROOT / "tools"))
    sys.path.insert(0, str(ROOT))
    import full_lap
    import bench as B
    import jax
    import jax.numpy as jnp

    from acmpc_tpu.bench import LapSweep, SweepGrid
    from acmpc_tpu.localise.track_map import load_track_map

    mpc = B._closed_loop_mpc()
    tm = load_track_map(ROOT / "data/maps/synth_nordschleife.npy")
    n_pts = int(tm.centre.shape[0])
    grid = SweepGrid.perturbed(jax.random.PRNGKey(0), 2, n_pts, v_max=24.0)

    sweep = LapSweep(mpc, tm, half_width=4.5, dt=0.1)
    out = full_lap.run_laps(sweep, grid, 0.1, max_steps=30)
    assert out["total_solves"] == 60
    assert out["sequential_solves_per_scenario"] == 30
    assert out["solve_success_rate"] >= 0.9
    assert out["completed_laps"] == 0  # 30 steps cannot lap 19.7 km
    assert out["lap_time_s_mean"] is None

    # raceline + shipped speed profile (exercises the windowed
    # map-speed cap through the fused batched path)
    data = np.load(ROOT / "data/racelines/synth_nordschleife.npz")
    rsweep = LapSweep(
        mpc,
        tm,
        half_width=4.5,
        dt=0.1,
        reference_polyline=data["raceline"],
        reference_widths=data["widths"],
        reference_speeds=data["speeds"],
    )
    rgrid = grid.replace(
        start_index=(
            grid.start_index.astype(jnp.float32)
            * (len(data["raceline"]) / n_pts)
        ).astype(jnp.int32),
        lateral_offset=jnp.zeros_like(grid.lateral_offset),
        v_max=jnp.full_like(grid.v_max, 32.0),
    )
    r = full_lap.run_laps(rsweep, rgrid, 0.1, max_steps=10)
    assert r["solve_success_rate"] >= 0.9
    # the shipped profile caps the runtime speed, so the cars move
    assert r["total_solves"] == 20
