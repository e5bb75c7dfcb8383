"""Multi-host (pod-slice) launch CLI.

The reference has no multi-machine story (SURVEY.md §5.8); this is the
TPU-native one: run ONE copy of this process per host with the same
coordinator address, and the closed-loop robustness sweep (BASELINE
configs 3/5) shards over the full ("host", "chip") pod mesh — intra-host
work rides ICI, the only DCN traffic is the few-scalar fleet summary.

Single-host (or CI virtual-mesh) runs need no flags:

  acmpc-launch-pod --map data/maps/synth_nordschleife.npy

Pod slice, e.g. 2 hosts:

  host0$ acmpc-launch-pod --coordinator host0:8476 --num-hosts 2 --host-id 0
  host1$ acmpc-launch-pod --coordinator host0:8476 --num-hosts 2 --host-id 1
"""

from __future__ import annotations

import argparse
import json
import time


def run_two_process_smoke(
    scenarios_per_chip=2,
    steps=2,
    timeout=420,
    full_lap=False,
    map_path=None,
    v_max=None,
):
    """Launch this CLI as TWO coordinated ``jax.distributed`` processes
    (gloo over loopback, 2 virtual CPU devices each) and return process
    0's fleet-summary dict.

    This executes the real multi-process path — distributed init, the
    ("host", "chip") pod mesh, cross-process collectives — so the DCN
    code (`parallel/multihost.py`) runs before it ever meets a real pod.
    Used by tests/test_multiprocess_distributed.py and dryrun_multichip.
    With ``full_lap=True`` the sweep drives every scenario sequentially
    to lap completion (or ``steps`` as the cap) through
    ``sharded_full_lap`` — BASELINE config 5's pod wording, exercised by
    the same CLI that would run on a real pod (tools/record_pod_lap.py).
    """
    import os
    import socket
    import subprocess
    import sys
    from pathlib import Path

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_NUM_CPU_DEVICES", None)
    args = [
        sys.executable,
        "-m",
        "acmpc_tpu.cli.launch_pod",
        "--coordinator",
        f"127.0.0.1:{port}",
        "--num-hosts",
        "2",
        "--scenarios-per-chip",
        str(scenarios_per_chip),
        "--steps",
        str(steps),
    ]
    if full_lap:
        args.append("--full-lap")
    if map_path is not None:
        args += ["--map", str(map_path)]
    if v_max is not None:
        args += ["--v-max", str(v_max)]
    repo = Path(__file__).resolve().parents[2]
    procs = [
        subprocess.Popen(
            args + ["--host-id", str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
            cwd=repo,
        )
        for i in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            outs.append((p.returncode,) + p.communicate(timeout=timeout))
    finally:
        for p in procs:  # kill only the exact children we started
            if p.poll() is None:
                p.kill()
    for p, (_, out, err) in zip(procs, outs):
        if p.returncode != 0:
            raise RuntimeError(
                f"pod process failed (rc={p.returncode}):\n{out}\n{err}"
            )
    summaries = [
        json.loads(line)
        for line in outs[0][1].splitlines()
        if line.startswith("{")
    ]
    if not summaries:
        raise RuntimeError(f"process 0 printed no summary:\n{outs[0][1]}")
    return summaries[-1]


def main():
    ap = argparse.ArgumentParser(description="Pod-sharded closed-loop sweep")
    ap.add_argument("--coordinator", default=None, help="host:port of host 0")
    ap.add_argument("--num-hosts", type=int, default=1)
    ap.add_argument("--host-id", type=int, default=0)
    ap.add_argument("--map", default="data/maps/synth_nordschleife.npy")
    ap.add_argument("--scenarios-per-chip", type=int, default=32)
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--horizon", type=int, default=50)
    ap.add_argument("--v-max", type=float, default=24.0)
    ap.add_argument(
        "--full-lap",
        action="store_true",
        help="drive every scenario sequentially to lap completion "
        "(--steps becomes the cap) instead of a fixed-step sweep",
    )
    ap.add_argument("--dt", type=float, default=0.1)
    args = ap.parse_args()

    # honour JAX_PLATFORMS=cpu + xla_force_host_platform_device_count on
    # images whose sitecustomize preregisters a TPU-tunnel platform (the
    # config API wins where plain env vars do not)
    import os
    import re

    flags = os.environ.get("XLA_FLAGS", "")
    want = re.search(r"xla_force_host_platform_device_count=(\d+)", flags)
    if "cpu" in os.environ.get("JAX_PLATFORMS", "") or want:
        import jax as _jax

        try:
            _jax.config.update("jax_platforms", "cpu")
            if want:
                _jax.config.update("jax_num_cpu_devices", int(want.group(1)))
        except RuntimeError:
            pass  # backend already initialised; use whatever exists

    from acmpc_tpu.parallel.multihost import (
        initialize_distributed,
        make_pod_mesh,
        grid_sharding,
        put_global,
        sharded_full_lap,
        sharded_lap_sweep,
    )

    initialize_distributed(
        coordinator_address=args.coordinator,
        num_processes=args.num_hosts,
        process_id=args.host_id,
    )

    import jax
    import dataclasses
    import pathlib

    from acmpc_tpu.bench.lap_sweep import LapSweep, SweepGrid
    from acmpc_tpu.config import load_config
    from acmpc_tpu.dynamics import SpatialBicycleModel
    from acmpc_tpu.localise.track_map import load_track_map
    from acmpc_tpu.mpc.spatial_mpc import SpatialMPC

    # resolve repo-root-relative paths so the CLI works from any cwd
    # (the 2-process smoke test launches it from a temp dir)
    root = pathlib.Path(__file__).resolve().parents[2]

    def _resolve(p):
        p = pathlib.Path(p)
        return p if p.exists() else root / p

    cfg = load_config(_resolve("configs/monza.yaml"))
    control = dataclasses.replace(
        cfg.racing_control, horizon=args.horizon, rti_iterations=50
    )
    model = SpatialBicycleModel(
        vehicle=cfg.vehicle,
        min_velocity=control.constraints.v_min,
        max_velocity=control.constraints.v_max,
    )
    mpc = SpatialMPC(control, model)
    tm = load_track_map(_resolve(args.map))
    sweep = LapSweep(mpc, tm, half_width=4.5, dt=0.1)

    mesh = make_pod_mesh()
    n_chips = mesh.devices.size
    batch = args.scenarios_per_chip * n_chips
    grid = SweepGrid.perturbed(
        jax.random.PRNGKey(0), batch, int(tm.centre.shape[0]), v_max=args.v_max
    )
    grid = put_global(grid, grid_sharding(mesh))

    summary = {
        "hosts": jax.process_count(),
        "chips": n_chips,
        "mesh": dict(zip(mesh.axis_names, mesh.devices.shape)),
        "scenarios": batch,
        "steps": args.steps,
    }
    if args.full_lap:
        run = sharded_full_lap(sweep, mesh, args.steps, args.dt)
        t0 = time.perf_counter()
        fleet = run(grid)
        jax.block_until_ready(fleet["n_solved"])
        wall = time.perf_counter() - t0
        laps = int(fleet["completed_laps"])
        centre = tm.centre
        import jax.numpy as jnp

        lap_len = float(
            jnp.sum(
                jnp.linalg.norm(
                    jnp.roll(centre, -1, axis=0) - centre, axis=-1
                )
            )
        )
        summary.update(
            {
                "mode": "full_lap",
                "map_km": round(lap_len / 1000, 2),
                "dt": args.dt,
                "total_solves": int(fleet["n_solves"]),
                "solve_success_rate": round(
                    float(fleet["n_solved"]) / float(fleet["n_solves"]), 4
                ),
                "completed_laps": laps,
                "lap_time_s_mean": (
                    round(float(fleet["lap_steps_sum"]) / laps * args.dt, 1)
                    if laps
                    else None
                ),
                "lap_time_s_best": (
                    round(float(fleet["lap_steps_min"]) * args.dt, 1)
                    if laps
                    else None
                ),
                "fail_max_iter": int(fleet["fail_max_iter"]),
                "fail_infeasible": int(fleet["fail_infeasible"]),
                "worst_offtrack_m": round(float(fleet["worst_offtrack"]), 2),
                "mean_speed_ms": round(float(fleet["mean_speed"]), 2),
                "wall_s": round(wall, 1),
                "solves_per_s": round(int(fleet["n_solves"]) / wall, 1),
            }
        )
    else:
        run = sharded_lap_sweep(sweep, mesh, args.steps)
        metrics, fleet = run(grid)  # compile + first run
        jax.block_until_ready(fleet["n_solved"])
        t0 = time.perf_counter()
        metrics, fleet = run(grid)
        jax.block_until_ready(fleet["n_solved"])
        wall = time.perf_counter() - t0
        summary.update(
            {
                "solves_per_s": round(batch * args.steps / wall, 1),
                "success_rate": round(
                    float(fleet["n_solved"]) / float(fleet["n_solves"]), 4
                ),
                "worst_offtrack_m": round(float(fleet["worst_offtrack"]), 2),
                "mean_speed_ms": round(float(fleet["mean_speed"]), 2),
            }
        )
    if jax.process_index() == 0:
        print(json.dumps(summary))


if __name__ == "__main__":
    main()
