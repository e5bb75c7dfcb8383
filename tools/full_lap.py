"""Full-lap sweep: BASELINE config 5 — 10k+ SEQUENTIAL solves per
scenario around the complete shipped circuit, a scenario grid in
parallel.

Each step is the fully on-device closed loop (window extraction ->
fused-Pallas batched QP -> command selection -> kinematic integration);
the laps are genuinely sequential (every solve warm-starts from the
previous step's shifted iterates). Prints one JSON line with lap
statistics and (optionally) writes it to an artifact file.

--compare-raceline additionally runs the same grid tracking the SHIPPED
minimum-curvature raceline + its speed profile (BASELINE config 1's
"raceline + speed profile" wording) and reports the LAP-TIME comparison
raceline-vs-centreline — the full-lap answer to the question the 25-step
mean-speed bench can only gesture at.

Run:  python tools/full_lap.py [--scenarios 32] [--compare-raceline]
      [--out FULL_LAP.json] [--map data/maps/synth_nordschleife.npy]
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


def run_laps(sweep, grid, dt: float, max_steps: int) -> dict:
    """Drive every scenario to lap completion (or max_steps); returns lap
    statistics. Progress is accumulated from map-index deltas along the
    sweep's own reference polyline."""
    import jax
    import jax.numpy as jnp

    centre = np.asarray(sweep._centre)
    n_pts = len(centre)
    lap_len = float(
        np.linalg.norm(
            np.diff(np.vstack([centre, centre[:1]]), axis=0), axis=1
        ).sum()
    )
    spacing = lap_len / n_pts
    n_scen = int(grid.start_index.shape[0])

    cars = jax.vmap(sweep._init_car)(grid)
    states = jax.vmap(lambda _: sweep.mpc.initial_state())(
        jnp.arange(n_scen)
    )
    _, prev_i0 = jax.vmap(sweep._ego_window)(cars)

    progress = np.zeros(n_scen)
    lap_steps = np.full(n_scen, -1, np.int64)
    status_counts: dict[int, int] = {}
    solves_ok = 0
    total = 0

    t0 = time.perf_counter()
    step = 0
    while step < max_steps and (lap_steps < 0).any():
        cars, states, metrics, i0 = sweep._fused_step(
            cars, states, grid.v_max, prev_i0
        )
        delta = np.mod(np.asarray(i0) - np.asarray(prev_i0), n_pts)
        # windows only move forward; a large residual means wraparound noise
        delta = np.where(delta > n_pts // 2, 0, delta)
        progress += delta * spacing
        newly = (lap_steps < 0) & (progress >= lap_len)
        lap_steps[newly] = step + 1
        solved = np.asarray(metrics["solved"])
        solves_ok += int(solved.sum())
        status = np.asarray(metrics["control_status"])
        for st in np.unique(status[~solved.astype(bool)]):
            status_counts[int(st)] = status_counts.get(int(st), 0) + int(
                ((status == st) & ~solved.astype(bool)).sum()
            )
        total += n_scen
        prev_i0 = i0
        step += 1
    wall = time.perf_counter() - t0

    done = lap_steps > 0
    lap_times = lap_steps[done] * dt
    return {
        "map_km": round(lap_len / 1000, 2),
        "scenarios": n_scen,
        "completed_laps": int(done.sum()),
        "sequential_solves_per_scenario": step,
        "total_solves": total,
        "solve_success_rate": round(solves_ok / max(total, 1), 4),
        "failure_status_histogram": {
            # by QP status (admm.py): 0 = iteration budget, 2 = primal
            # infeasibility certificate (keep-last-command semantics)
            str(k): v for k, v in sorted(status_counts.items())
        },
        "lap_time_s_best": (
            round(float(lap_times.min()), 1) if done.any() else None
        ),
        "lap_time_s_mean": (
            round(float(lap_times.mean()), 1) if done.any() else None
        ),
        "mean_lap_speed_ms": (
            round(float(lap_len / lap_times.mean()), 2) if done.any() else None
        ),
        "wall_s": round(wall, 1),
        "closed_loop_solves_per_s": round(total / wall, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--map", default=str(ROOT / "data/maps/synth_nordschleife.npy")
    )
    ap.add_argument(
        "--raceline",
        default=str(ROOT / "data/racelines/synth_nordschleife.npz"),
    )
    ap.add_argument("--scenarios", type=int, default=32)
    ap.add_argument("--v-max", type=float, default=24.0)
    ap.add_argument("--dt", type=float, default=0.1)
    ap.add_argument("--max-steps", type=int, default=12000)
    ap.add_argument(
        "--compare-raceline",
        action="store_true",
        help="also lap the shipped raceline + speed profile; report the "
        "lap-time comparison",
    )
    ap.add_argument("--out", default=None, help="also write JSON here")
    args = ap.parse_args()

    import jax

    import bench as B
    from acmpc_tpu.bench import LapSweep, SweepGrid
    from acmpc_tpu.localise.track_map import load_track_map

    mpc = B._closed_loop_mpc()
    tm = load_track_map(args.map)
    n_pts = int(tm.centre.shape[0])
    grid = SweepGrid.perturbed(
        jax.random.PRNGKey(0), args.scenarios, n_pts, v_max=args.v_max
    )

    sweep = LapSweep(mpc, tm, half_width=4.5, dt=args.dt)
    out = {"backend": jax.default_backend()}
    out.update(run_laps(sweep, grid, args.dt, args.max_steps))

    if args.compare_raceline:
        import jax.numpy as jnp

        data = np.load(args.raceline)
        rsweep = LapSweep(
            mpc,
            tm,
            half_width=4.5,
            dt=args.dt,
            reference_polyline=data["raceline"],
            reference_widths=data["widths"],
            reference_speeds=data["speeds"],
        )
        n_line = len(data["raceline"])
        scale = n_line / n_pts
        rgrid = grid.replace(
            start_index=(
                grid.start_index.astype(jnp.float32) * scale
            ).astype(jnp.int32),
            # start ON the raceline: its corridor can leave <1 m of play
            lateral_offset=jnp.zeros_like(grid.lateral_offset),
            # let the shipped speed profile (not the grid) set the cap
            v_max=jnp.full_like(grid.v_max, 32.0),
        )
        r = run_laps(rsweep, rgrid, args.dt, args.max_steps)
        out["raceline"] = r
        # matched-cap centreline laps (corner-limited, cap 30 like the
        # bench's uplift section) so the lap-time ratio compares lines,
        # not speed caps
        cgrid = grid.replace(
            lateral_offset=jnp.zeros_like(grid.lateral_offset),
            v_max=jnp.full_like(grid.v_max, 30.0),
        )
        c = run_laps(sweep, cgrid, args.dt, args.max_steps)
        out["centreline_at_vmax30"] = c
        if r["lap_time_s_mean"] and c["lap_time_s_mean"]:
            # < 1.0 means the raceline laps FASTER
            out["raceline_lap_time_ratio"] = round(
                r["lap_time_s_mean"] / c["lap_time_s_mean"], 4
            )

    line = json.dumps(out)
    print(line)
    if args.out:
        pathlib.Path(args.out).write_text(line + "\n")


if __name__ == "__main__":
    main()
