"""Benchmark: MPC solves/s per chip at full racing horizon (H=50).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Sections (all on-device, one chip):
  - throughput: B=256 scenario batch as one jitted program (the TPU-native
    replacement for the reference's per-step OSQP loop,
    /root/reference/src/acmpc/control/controller.py:226-231)
  - latency: blocked-step p50/p99 at B=1 (the production agent path,
    SpatialMPC.jitted_get_control) and B in {8, 32, 256} (fused batched
    engine) — the reference serves game frames at ~20-60 Hz, so the
    real-time budget is 16-50 ms
  - robustness: BASELINE config 3 — 4096 perturbed scenarios solved in one
    step, with HBM headroom
  - closed loop: lap sweep on the SHIPPED 19.7 km mapping-pipeline-built
    circuit (data/maps/synth_nordschleife.npy), with per-status failure
    breakdown

Baseline denominator: MEASURED by tools/measure_cpu_baseline.py, which
drives the reference's own get_control loop
(/root/reference/src/acmpc/control/spatial_mpc.py:170-217) on sliding
horizon-50 centreline windows across all 7 track configs and records
baseline_cpu.json. The denominator is the upper-bound variant (QP solve
replaced by cached-result replay, i.e. the reference's per-solve
Python/scipy work alone — a strict ceiling on its throughput regardless of
QP solver speed); the faithful full loop measured ~101 solves/s.
"""

from __future__ import annotations

import json
import pathlib
import time

import numpy as np

ROOT = pathlib.Path(__file__).parent
_FALLBACK_BASELINE = 500.0  # estimate used before baseline_cpu.json existed


def _cpu_baseline_solves_per_s() -> tuple[float, str]:
    path = ROOT / "baseline_cpu.json"
    if path.exists():
        data = json.loads(path.read_text())
        return float(data["denominator_solves_per_s"]), data["denominator_kind"]
    return _FALLBACK_BASELINE, "estimate"


CPU_BASELINE_SOLVES_PER_S, CPU_BASELINE_KIND = _cpu_baseline_solves_per_s()

HORIZON = 50


def _mixed_refs(ge, batch: int):
    """Half gentle curves, half hairpins (feasible at H=50)."""
    import jax.numpy as jnp

    from acmpc_tpu.geometry.tracks import get_hairpin_track, with_widths

    gentle = np.asarray(ge._reference_window(HORIZON, batch // 2))
    hard = np.stack(
        [
            with_widths(get_hairpin_track(30.0 + 2.0 * i, HORIZON))
            for i in range(batch - batch // 2)
        ]
    )
    return jnp.asarray(np.concatenate([gentle, hard]), jnp.float32)


def _device_backend_alive(timeout_s: float = 180.0) -> bool:
    """Probe the accelerator backend in a SUBPROCESS with a timeout: a
    dead TPU tunnel makes in-process backend init hang in C (no exception
    to catch), which would otherwise take the whole bench down."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    import os

    # resilience: if the accelerator backend is unreachable (tunnel
    # outage), fall back to CPU so the bench still emits its JSON line
    # (the backend field shows what actually ran) instead of hanging
    if os.environ.get("JAX_PLATFORMS", "") not in ("cpu",) and not (
        _device_backend_alive()
    ):
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass

    import jax

    import __graft_entry__ as ge

    backend = jax.default_backend()
    n_dev = jax.device_count()
    on_tpu = backend != "cpu"
    batch = 256 if on_tpu else 32

    mpc = ge._make_mpc(HORIZON)
    refs = _mixed_refs(ge, batch)
    states = jax.vmap(lambda: mpc.initial_state(), axis_size=batch)()
    step = lambda s, r: mpc.batched_get_control_fused(s, r)[0]

    # warmup / compile
    out = step(states, refs)
    jax.block_until_ready(out.projected_control)

    # throughput: continuous dependent chain (host prep overlaps device)
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(out, refs)
    jax.block_until_ready(out.projected_control)
    dt = time.perf_counter() - t0
    per_chip = batch * iters / dt  # single-chip benchmark

    # latency: blocked round trips (dispatch + execute) per batch size
    latency = {str(batch): _blocked_latency(lambda: step(out, refs))}
    for b in (1, 8, 32):
        if b >= batch:
            continue
        latency[str(b)] = _batch_latency(jax, mpc, ge, b)

    sections: dict = {}
    # robustness batch (BASELINE config 3): 4096 scenarios in one step
    try:
        sections.update(_robustness_batch(jax, mpc, ge, 4096 if on_tpu else 64))
    except Exception as exc:  # pragma: no cover - infra flakiness
        sections["robustness_error"] = type(exc).__name__

    # perception: the reference's headline inference config (FPN-ResNet18,
    # 10 classes, 1280x736, reduced precision — BASELINE.md) on the
    # SHIPPED trained checkpoint, fused with track extraction
    try:
        sections.update(_perception_fps(jax))
    except Exception as exc:  # pragma: no cover - infra flakiness
        sections["perception_error"] = type(exc).__name__

    # closed-loop lap sweep on the shipped mapping-pipeline-built circuit
    try:
        sections.update(_closed_loop_solves_per_s(backend))
    except Exception as exc:  # pragma: no cover - infra flakiness
        sections["closed_loop_error"] = type(exc).__name__

    # closed loop TRACKING THE SHIPPED RACELINE (BASELINE config 1): same
    # map, the minimum-curvature line + its corridor widths as the
    # reference path — the speed uplift over centreline tracking is the
    # raceline's value, measured in closed loop (the reference's raceline
    # tool is offline-only and never drives)
    try:
        sections.update(_raceline_closed_loop(backend))
    except Exception as exc:  # pragma: no cover - infra flakiness
        sections["raceline_error"] = type(exc).__name__

    result = {
        "metric": f"mpc_solves_per_s_per_chip_h{HORIZON}",
        "value": round(per_chip, 2),
        "unit": "solves/s",
        "vs_baseline": round(per_chip / CPU_BASELINE_SOLVES_PER_S, 3),
        "baseline_solves_per_s": CPU_BASELINE_SOLVES_PER_S,
        "baseline_kind": CPU_BASELINE_KIND,
        "backend": backend,
        "batch": batch,
        "n_devices": n_dev,
        "p50_step_latency_ms": latency[str(batch)][0],
        "p99_step_latency_ms": latency[str(batch)][1],
        "latency_ms_by_batch": {
            k: {"p50": v[0], "p99": v[1]} for k, v in sorted(
                latency.items(), key=lambda kv: int(kv[0])
            )
        },
        **sections,
    }
    print(json.dumps(result))


def _blocked_latency(run, n: int = 10) -> tuple[float, float]:
    import jax

    times = []
    for _ in range(n):
        t1 = time.perf_counter()
        out = run()
        jax.block_until_ready(
            out.projected_control if hasattr(out, "projected_control") else out
        )
        times.append(time.perf_counter() - t1)
    return (
        round(1e3 * float(np.percentile(times, 50)), 2),
        round(1e3 * float(np.percentile(times, 99)), 2),
    )


def _batch_latency(jax, mpc, ge, b: int) -> tuple[float, float]:
    """Blocked-step latency at batch b. b=1 times the PRODUCTION agent
    path (SpatialMPC.jitted_get_control — what the free-running control
    thread calls per frame); b>1 the fused batched engine."""
    refs = _mixed_refs(ge, b) if b > 1 else ge._reference_window(HORIZON)
    if b == 1:
        state = mpc.initial_state()
        out, _ = mpc.jitted_get_control(state, refs)
        jax.block_until_ready(out.projected_control)
        return _blocked_latency(lambda: mpc.jitted_get_control(out, refs)[0])
    states = jax.vmap(lambda: mpc.initial_state(), axis_size=b)()
    out = mpc.batched_get_control_fused(states, refs)[0]
    jax.block_until_ready(out.projected_control)
    return _blocked_latency(lambda: mpc.batched_get_control_fused(out, refs)[0])


def _robustness_batch(jax, mpc, ge, b: int) -> dict:
    """BASELINE config 3: a 4096-scenario perturbed batch solved per
    control step, single chip, with HBM headroom."""
    refs = _mixed_refs(ge, b)
    states = jax.vmap(lambda: mpc.initial_state(), axis_size=b)()
    out = mpc.batched_get_control_fused(states, refs)[0]
    jax.block_until_ready(out.projected_control)
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = mpc.batched_get_control_fused(out, refs)[0]
    jax.block_until_ready(out.projected_control)
    dt = time.perf_counter() - t0
    sec = {
        "robustness_batch": b,
        "robustness_solves_per_s": round(b * iters / dt, 1),
        "robustness_step_ms": round(1e3 * dt / iters, 1),
    }
    stats = getattr(jax.local_devices()[0], "memory_stats", lambda: None)()
    if stats and stats.get("bytes_limit"):
        sec["hbm_gb_in_use"] = round(stats["bytes_in_use"] / 2**30, 2)
        sec["hbm_gb_limit"] = round(stats["bytes_limit"] / 2**30, 2)
    return sec


def _perception_fps(jax) -> dict:
    """Device-resident segmentation+extraction throughput at the configs'
    camera resolution (1280x736 bf16), shipped weights. Each frame
    depends on the previous mask so XLA cannot overlap the chain; the
    number is per-frame device latency, directly comparable to the
    reference's TensorRT engine (segmentation.py:38-53)."""
    import jax.numpy as jnp

    from acmpc_tpu.config import load_config
    from acmpc_tpu.perception.perceiver import Perceiver

    cfg = load_config(ROOT / "configs" / "monza.yaml").perception
    perc = Perceiver(cfg)
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(
        rng.integers(
            0, 255, (cfg.image_height, cfg.image_width, 3), dtype=np.uint8
        )
    )

    @jax.jit
    def step(img):
        drivable, _, tracks = perc._pipeline(perc.segmenter.variables, img)
        return (img + drivable[..., None]).astype(jnp.uint8), tracks["centre"]

    img, c = step(img0)
    jax.block_until_ready(c)
    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        img, c = step(img)
    jax.block_until_ready(c)
    dt = (time.perf_counter() - t0) / n
    return {
        "perception_ms_per_frame": round(1e3 * dt, 2),
        "perception_fps": round(1.0 / dt, 1),
        "perception_resolution": f"{cfg.image_width}x{cfg.image_height}",
    }


def _closed_loop_mpc():
    """The shared closed-loop MPC (racing horizon, RTI budget)."""
    from acmpc_tpu.dynamics import SpatialBicycleModel, VehicleParams
    from acmpc_tpu.mpc.spatial_mpc import MPCConfig, SpatialMPC
    from acmpc_tpu.qp.speed_profile import SpeedProfileConstraints

    constraints = SpeedProfileConstraints(
        v_min=5.0, v_max=30.0, a_min=-3.0, a_max=6.0,
        ay_max=5.5, ki_min=0.005, end_velocity=10.0,
    )
    # RTI budget 50 suffices for 100% closed-loop success on the shipped
    # 22 km map. (Round-1's 4% failures were diagnosed to pathological
    # map geometry — a self-crossing synthetic circuit plus ordering
    # folds gave kappa spikes of 50 rad/m whose QPs are physically
    # absurd; fixed by the simple-by-construction circuit generator and
    # the map maker's fold-removal + uniform arc-length resampling.)
    config = MPCConfig(
        horizon=HORIZON,
        step_cost=(4.0e-3, 5.0e-2, 0.0),
        r_term=(1.0e-2, 10.0),
        final_cost=(1.0, 0.0, 0.1),
        constraints=constraints,
        rti_iterations=50,
    )
    model = SpatialBicycleModel(
        vehicle=VehicleParams(), min_velocity=5.0, max_velocity=30.0
    )
    return SpatialMPC(config, model)


def _bench_map():
    import jax.numpy as jnp

    from acmpc_tpu.localise.track_map import TrackMap, load_track_map

    shipped = ROOT / "data" / "maps" / "synth_nordschleife.npy"
    if shipped.exists():
        return (
            load_track_map(shipped),
            4.5,
            f"synth_nordschleife ({shipped.name})",
        )
    # fallback: analytic wavy circle
    theta = np.linspace(0, 2 * np.pi, 1500, endpoint=False)
    r = 200.0 + 30.0 * np.sin(theta) + 15.0 * np.sin(2 * theta)
    centre = np.stack([r * np.cos(theta), r * np.sin(theta)], axis=1)
    d = np.roll(centre, -1, axis=0) - centre
    t = d / np.linalg.norm(d, axis=1, keepdims=True)
    n = np.stack([-t[:, 1], t[:, 0]], axis=1)
    tm = TrackMap(
        centre=jnp.asarray(centre, jnp.float32),
        left=jnp.asarray(centre + 5 * n, jnp.float32),
        right=jnp.asarray(centre - 5 * n, jnp.float32),
    )
    return tm, 5.0, "analytic_circle"


def _run_sweep(backend: str, sweep, n_pts: int, v_max: float = 24.0):
    import jax

    from acmpc_tpu.bench import SweepGrid

    B, N = (256, 25) if backend != "cpu" else (16, 10)
    grid = SweepGrid.perturbed(jax.random.PRNGKey(0), B, n_pts, v_max=v_max)
    _, metrics = sweep.run_fused(grid, N)  # compile
    jax.block_until_ready(metrics["v"])
    t0 = time.perf_counter()
    _, metrics = sweep.run_fused(grid, N)
    jax.block_until_ready(metrics["v"])
    wall = time.perf_counter() - t0
    return sweep.summarise(metrics, N), B * N / wall


def _closed_loop_solves_per_s(backend: str) -> dict:
    from acmpc_tpu.bench import LapSweep

    mpc = _closed_loop_mpc()
    tm, half_width, map_name = _bench_map()
    sweep = LapSweep(mpc, tm, half_width=half_width, dt=0.1)
    s, solves_per_s = _run_sweep(backend, sweep, int(tm.centre.shape[0]))
    out = {
        "closed_loop_solves_per_s": round(solves_per_s, 1),
        "closed_loop_success_rate": round(s["solve_success_rate"], 4),
        "closed_loop_map": map_name,
        "closed_loop_mean_speed_ms": round(s["mean_speed_ms"], 2),
    }
    for k in (
        "fail_max_iter_frac",
        "fail_primal_infeasible_frac",
        "fail_persistent_scenarios",
        "crashed_scenarios",
        "in_corridor_fail_rate",
    ):
        if k in s:
            v = s[k]
            out["closed_loop_" + k] = round(v, 4) if isinstance(v, float) else v
    return out


def _raceline_closed_loop(backend: str) -> dict:
    import jax
    import jax.numpy as jnp

    from acmpc_tpu.bench import LapSweep, SweepGrid

    line_path = ROOT / "data" / "racelines" / "synth_nordschleife.npz"
    if not line_path.exists():
        return {}
    data = np.load(line_path)
    mpc = _closed_loop_mpc()
    tm, half_width, _ = _bench_map()
    sweep = LapSweep(
        mpc,
        tm,
        half_width=half_width,
        dt=0.1,
        reference_polyline=data["raceline"],
        reference_widths=data["widths"],
    )
    # corner-limited comparison: uncapped runtime speed (v_max 30) so the
    # lap speed is set by curvature, where the raceline earns its keep
    B, N = (256, 25) if backend != "cpu" else (16, 10)
    grid = SweepGrid.perturbed(
        jax.random.PRNGKey(0), B, len(data["raceline"]), v_max=30.0
    )
    grid = grid.replace(v_max=jnp.minimum(grid.v_max, 30.0))
    # the raceline hugs the boundaries: clip each start's lateral offset
    # into ITS corridor (the default +-3 m is instantly illegal where the
    # corridor floor leaves 0.75 m of play)
    margin = mpc.model.margin
    play = (
        jnp.asarray(data["widths"])[grid.start_index] / 2.0 - margin
    ) * 0.8
    grid = grid.replace(
        lateral_offset=jnp.clip(grid.lateral_offset, -play, play)
    )
    _, metrics = sweep.run_fused(grid, N)  # compile + run
    jax.block_until_ready(metrics["v"])
    s = sweep.summarise(metrics, N)

    # the same grid positions tracking the CENTRELINE instead
    centre_sweep = LapSweep(mpc, tm, half_width=half_width, dt=0.1)
    n_centre = int(tm.centre.shape[0])
    scale = n_centre / len(data["raceline"])
    cgrid = grid.replace(
        start_index=(grid.start_index.astype(jnp.float32) * scale).astype(
            jnp.int32
        ),
        lateral_offset=jnp.zeros_like(grid.lateral_offset),
    )
    _, cmetrics = centre_sweep.run_fused(cgrid, N)
    jax.block_until_ready(cmetrics["v"])
    cs = centre_sweep.summarise(cmetrics, N)

    # Finding worth recording: the uplift is ~1.0 on this map because the
    # MPC already corner-cuts ONLINE — e_y is free inside the corridor
    # bounds and the time cost pushes the plan to the inside of every
    # corner, so a precomputed raceline mostly re-states what the solver
    # does per window. The section demonstrates BASELINE config 1
    # (tracking the shipped raceline + speed profile) and pins that
    # behaviour with numbers.
    return {
        "raceline_success_rate": round(s["solve_success_rate"], 4),
        "raceline_mean_speed_ms": round(s["mean_speed_ms"], 2),
        "raceline_p95_offtrack_m": round(s["p95_offtrack_m"], 2),
        "centreline_mean_speed_ms_at_vmax30": round(cs["mean_speed_ms"], 2),
        "raceline_speed_uplift": round(
            s["mean_speed_ms"] / max(cs["mean_speed_ms"], 1e-9), 4
        ),
    }


if __name__ == "__main__":
    main()
