"""Full-lap sweep: BASELINE config 5 — 10k+ SEQUENTIAL solves per
scenario around the complete shipped circuit, a scenario grid in
parallel.

Each step is the fully on-device closed loop (window extraction ->
fused-Pallas batched QP -> command selection -> kinematic integration);
the laps are genuinely sequential (every solve warm-starts from the
previous step's shifted iterates). Prints one JSON line with lap
statistics.

Run:  python tools/full_lap.py [--scenarios 32] [--map data/maps/synth_nordschleife.npy]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--map", default=str(ROOT / "data/maps/synth_nordschleife.npy"))
    ap.add_argument("--scenarios", type=int, default=32)
    ap.add_argument("--v-max", type=float, default=24.0)
    ap.add_argument("--dt", type=float, default=0.1)
    ap.add_argument("--max-steps", type=int, default=12000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench as B
    from acmpc_tpu.bench import LapSweep, SweepGrid

    mpc = B._closed_loop_mpc()
    from acmpc_tpu.localise.track_map import load_track_map

    tm = load_track_map(args.map)
    centre = np.asarray(tm.centre)
    lap_len = float(
        np.linalg.norm(np.diff(np.vstack([centre, centre[:1]]), axis=0), axis=1).sum()
    )
    sweep = LapSweep(mpc, tm, half_width=4.5, dt=args.dt)

    n_pts = len(centre)
    grid = SweepGrid.perturbed(
        jax.random.PRNGKey(0), args.scenarios, n_pts, v_max=args.v_max
    )
    cars = jax.vmap(sweep._init_car)(grid)
    states = jax.vmap(lambda _: mpc.initial_state())(jnp.arange(args.scenarios))
    _, prev_i0 = jax.vmap(sweep._ego_window)(cars)
    start_i0 = prev_i0

    # track per-scenario cumulative progress via map-index deltas
    progress = np.zeros(args.scenarios)
    lap_steps = np.full(args.scenarios, -1, np.int64)
    solves_ok = 0
    total = 0
    spacing = lap_len / n_pts

    t0 = time.perf_counter()
    step = 0
    while step < args.max_steps and (lap_steps < 0).any():
        cars, states, metrics, i0 = sweep._fused_step(
            cars, states, grid.v_max, prev_i0
        )
        delta = np.mod(np.asarray(i0) - np.asarray(prev_i0), n_pts)
        # windows only move forward; a large residual means wraparound noise
        delta = np.where(delta > n_pts // 2, 0, delta)
        progress += delta * spacing
        newly = (lap_steps < 0) & (progress >= lap_len)
        lap_steps[newly] = step + 1
        solves_ok += int(np.asarray(metrics["solved"]).sum())
        total += args.scenarios
        prev_i0 = i0
        step += 1
    wall = time.perf_counter() - t0

    done = lap_steps > 0
    lap_times = lap_steps[done] * args.dt
    out = {
        "map_km": round(lap_len / 1000, 2),
        "scenarios": args.scenarios,
        "completed_laps": int(done.sum()),
        "sequential_solves_per_scenario": step,
        "total_solves": total,
        "solve_success_rate": round(solves_ok / max(total, 1), 4),
        "lap_time_s_best": round(float(lap_times.min()), 1) if done.any() else None,
        "lap_time_s_mean": round(float(lap_times.mean()), 1) if done.any() else None,
        "mean_lap_speed_ms": round(
            float(lap_len / lap_times.mean()), 2
        ) if done.any() else None,
        "wall_s": round(wall, 1),
        "closed_loop_solves_per_s": round(total / wall, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
