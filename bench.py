"""Benchmark: MPC solves/s per chip at full racing horizon (H=50).

Prints JSON result lines to stdout; the LAST line is the complete
result (earlier lines are incremental snapshots of the same object, so
a wall-clock kill still leaves a parseable result with everything
measured so far):
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Wall-clock discipline (round-4 postmortem: the bench overran the
driver's budget and emitted nothing):
  - persistent XLA compile cache (same dir the agent uses,
    acmpc_tpu/runtime/agent.py) so repeat runs skip the multi-minute
    headline compile;
  - a global deadline (env BENCH_DEADLINE_S, default 900 s) after which
    remaining optional stages are skipped and listed in
    "skipped_stages";
  - the headline+latency JSON line is emitted the moment it exists and
    re-emitted after every completed stage.

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
  - closed loop: lap sweep on the SHIPPED 21.97 km mapping-pipeline-built
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
import os
import pathlib
import sys
import time

import numpy as np


def _progress(msg: str) -> None:
    """Stage markers on STDERR (stdout stays one parseable JSON line) so a
    wall-clock-limited run is diagnosable to the section that stalled."""
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


ROOT = pathlib.Path(__file__).parent
_FALLBACK_BASELINE = 500.0  # estimate used before baseline_cpu.json existed

# Global wall-clock budget. The driver kills the bench hard at an
# unknown wall clock (round 4: ~23 min, rc=124, zero output); default
# to finishing well inside that with slack for a cold-cache compile.
_START = time.monotonic()
_DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "900"))


def _remaining_s() -> float:
    return _DEADLINE_S - (time.monotonic() - _START)


def _emit(result: dict) -> None:
    """Print the current result object as one JSON line. Called after
    every completed stage: the last line on stdout is the full result,
    and any earlier line is a valid snapshot if the process is killed."""
    print(json.dumps(result), flush=True)


def _enable_compile_cache() -> None:
    """Persistent XLA compile cache (shared with the agent runtime,
    acmpc_tpu/runtime/agent.py): the headline B=256 fused step took 10
    minutes to compile cold through the TPU tunnel in round 4 — cached,
    it loads in seconds.

    Cache keying (per backend, per host-CPU fingerprint on CPU — a
    migrated VM must never load another host's AOT code):
    utils/compile_cache.py."""
    from acmpc_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()


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
    # (the backend field shows what actually ran) instead of hanging.
    # NOTE: the env var alone is NOT enough — this image's sitecustomize
    # preregisters the TPU-tunnel platform and JAX_PLATFORMS=cpu in the
    # environment still wedges on a dead tunnel; the config API is the
    # only reliable switch.
    tpu_unreachable = False
    want_cpu = os.environ.get("JAX_PLATFORMS", "") == "cpu"
    if not want_cpu and not _device_backend_alive():
        tpu_unreachable = True
    if want_cpu or tpu_unreachable:
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass

    import jax

    _enable_compile_cache()

    import __graft_entry__ as ge

    backend = jax.default_backend()
    n_dev = jax.device_count()
    on_tpu = backend != "cpu"
    batch = 256 if on_tpu else 32

    _progress(f"backend={backend} n_dev={n_dev}; compiling headline step")
    mpc = ge._make_mpc(HORIZON)
    refs = _mixed_refs(ge, batch)
    states = jax.vmap(lambda: mpc.initial_state(), axis_size=batch)()
    step = lambda s, r: mpc.batched_get_control_fused(s, r)[0]

    # warmup / compile
    out = step(states, refs)
    jax.block_until_ready(out.projected_control)

    _progress("headline throughput chain")
    # throughput: continuous dependent chain (host prep overlaps device)
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(out, refs)
    jax.block_until_ready(out.projected_control)
    dt = time.perf_counter() - t0
    per_chip = batch * iters / dt  # single-chip benchmark

    # latency: blocked round trips (dispatch + execute + host<->device
    # round trip — through the axon tunnel that costs ~27 ms flat) AND
    # dependency-chained device time (N dependent steps, one block, /N —
    # the kernel's own time, what optimisation work must compare)
    latency = {
        str(batch): _blocked_latency(lambda: step(out, refs))
        + (round(1e3 * dt / iters, 2),)
    }
    for b in (1, 8, 32):
        if b >= batch:
            continue
        latency[str(b)] = _batch_latency(jax, mpc, ge, b)

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
            k: {"p50": v[0], "p99": v[1], "device": v[2]}
            for k, v in sorted(latency.items(), key=lambda kv: int(kv[0]))
        },
        "headline_elapsed_s": round(time.monotonic() - _START, 1),
    }
    if tpu_unreachable:
        result["tpu_unreachable"] = True
    _progress("latency sweep done; emitting headline snapshot")
    _emit(result)

    # flop accounting (cheap, do it before any skippable stage):
    # arithmetic-intensity context for the throughput claim — small-QP
    # ADMM is GEMV-bound, so MFU is intrinsically low and
    # latency/solves-per-s is the product metric; this keeps the
    # headline honest about how far from the MXU ceiling it runs
    _, diags = mpc.batched_get_control_fused(out, refs)
    mean_iters = float(np.mean(np.asarray(diags.control_iterations)))
    flop = _flop_per_solve(mpc, mean_iters)
    result["mean_admm_iterations"] = round(mean_iters, 1)
    result["flop_per_solve_m"] = round(flop / 1e6, 1)
    result["achieved_gflop_per_s"] = round(per_chip * flop / 1e9, 2)

    # Optional stages: (name, estimated cost in s, thunk). Each runs only
    # if the remaining budget covers its estimate; skipped stages are
    # recorded. Ordered by value-per-second: the cheap device sweeps
    # first, the multi-minute closed-loop laps last.
    stages = [
        # iteration-precision sweep: tf32 GEMVs vs Precision.HIGHEST
        # (6-pass bf16 emulation) — the one free MXU lever
        ("precision", 90, lambda: _precision_sweep(jax, ge, batch, refs)),
        # BASELINE config 3: 4096 perturbed scenarios in one step
        (
            "robustness",
            90,
            lambda: _robustness_batch(jax, mpc, ge, 4096 if on_tpu else 64),
        ),
        # solves/s vs batch between headline 256 and the 4096 anchor —
        # the VMEM scenario-tile residency claim, measured
        (
            "wide_tile",
            150,
            lambda: _wide_tile_sweep(
                jax, mpc, ge, (512, 1024, 2048) if on_tpu else (64,)
            ),
        ),
        # FPN-ResNet18 1280x736 on shipped weights, fused w/ extraction
        ("perception", 120, lambda: _perception_fps(jax)),
        # closed-loop lap sweep on the shipped 22 km mapped circuit
        ("closed_loop", 180, lambda: _closed_loop_solves_per_s(backend)),
        # BASELINE config 1: shipped raceline vs centreline, closed loop
        ("raceline", 240, lambda: _raceline_closed_loop(backend)),
        # BASELINE config 4: frame->mask->limits->refit->replan, one
        # device program per frame, a full closed lap with real weights
        ("perception_in_loop", 300, lambda: _perception_in_loop(jax, backend)),
    ]
    skipped: list[str] = []
    result["skipped_stages"] = skipped
    for name, est_s, thunk in stages:
        if _remaining_s() < est_s:
            _progress(
                f"SKIP {name}: {_remaining_s():.0f}s left < {est_s}s estimate"
            )
            skipped.append(name)
            continue
        _progress(f"stage {name} ({_remaining_s():.0f}s left)")
        t0 = time.monotonic()
        try:
            result.update(thunk())
        except Exception as exc:  # pragma: no cover - infra flakiness
            result[f"{name}_error"] = type(exc).__name__
        result.setdefault("stage_s", {})[name] = round(
            time.monotonic() - t0, 1
        )
        _emit(result)

    result["total_elapsed_s"] = round(time.monotonic() - _START, 1)
    _progress("done")
    _emit(result)


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


def _chained_device_ms(jax, run, out0, n: int = 20) -> float:
    """Device time per step via a dependency chain: n dependent steps,
    ONE block at the end, divide — the tunnel round trip amortises away
    and what remains is kernel time."""
    out = out0
    t0 = time.perf_counter()
    for _ in range(n):
        out = run(out)
    jax.block_until_ready(out.projected_control)
    return round(1e3 * (time.perf_counter() - t0) / n, 2)


def _batch_latency(jax, mpc, ge, b: int) -> tuple[float, float, float]:
    """(blocked p50, blocked p99, chained device ms) at batch b. b=1
    times the PRODUCTION agent path (SpatialMPC.jitted_get_control — what
    the free-running control thread calls per frame); b>1 the fused
    batched engine."""
    refs = _mixed_refs(ge, b) if b > 1 else ge._reference_window(HORIZON)
    if b == 1:
        state = mpc.initial_state()
        out, _ = mpc.jitted_get_control(state, refs)
        jax.block_until_ready(out.projected_control)
        run = lambda s: mpc.jitted_get_control(s, refs)[0]
    else:
        states = jax.vmap(lambda: mpc.initial_state(), axis_size=b)()
        out = mpc.batched_get_control_fused(states, refs)[0]
        jax.block_until_ready(out.projected_control)
        run = lambda s: mpc.batched_get_control_fused(s, refs)[0]
    p50, p99 = _blocked_latency(lambda: run(out))
    return p50, p99, _chained_device_ms(jax, run, out)


def _flop_per_solve(mpc, iters: float) -> float:
    """Analytic useful FLOPs of one horizon-H control solve at the
    MEASURED iteration count: the ADMM iteration chain (x-update K^-1
    matvec 2n^2, A^T matvec 2mn, A matvec 2mn for residual/z) plus the
    one-off block factorisation (~2n^3 for the SPD inverse). Ruiz
    scaling, waypointing and the speed scan are second-order."""
    from acmpc_tpu.mpc.control_qp import control_qp_sizes

    n, m = control_qp_sizes(mpc.horizon)
    return iters * (2.0 * n * n + 4.0 * m * n) + 2.0 * n**3


def _precision_sweep(jax, ge, b: int, refs) -> dict:
    """Fused batched engine with iter_precision='tensorfloat32' vs the
    default 'highest' (qp/admm.py ADMMConfig.iter_precision): throughput
    of each and the worst command delta on identical inputs. On TPU,
    HIGHEST runs fp32-accurate matmuls as 6 bf16 passes; tf32-class
    precision halves that work on the MXU — this measures what that
    buys and what it costs in command accuracy."""
    import dataclasses

    from acmpc_tpu.mpc.spatial_mpc import SpatialMPC

    out: dict = {}
    controls = {}
    base = ge._make_mpc(HORIZON)
    for prec, key in (("highest", "highest"), ("tensorfloat32", "tf32")):
        mpc = SpatialMPC(base.config, base.model)
        mpc.admm = dataclasses.replace(mpc.admm, iter_precision=prec)
        states = jax.vmap(lambda: mpc.initial_state(), axis_size=b)()
        step = lambda s: mpc.batched_get_control_fused(s, refs)[0]
        first = step(states)
        jax.block_until_ready(first.projected_control)
        controls[key] = np.asarray(first.projected_control)
        n = 10
        cur = first
        t0 = time.perf_counter()
        for _ in range(n):
            cur = step(cur)
        jax.block_until_ready(cur.projected_control)
        out[f"precision_{key}_solves_per_s"] = round(
            b * n / (time.perf_counter() - t0), 1
        )
    out["tf32_speedup"] = round(
        out["precision_tf32_solves_per_s"]
        / max(out["precision_highest_solves_per_s"], 1e-9),
        3,
    )
    out["tf32_max_command_delta"] = round(
        float(np.max(np.abs(controls["tf32"] - controls["highest"]))), 5
    )
    return out


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


def _wide_tile_sweep(jax, mpc, ge, batches) -> dict:
    """solves/s at each batch width between the headline 256 and the 4096
    robustness anchor. The fused Pallas iteration kernel tiles scenarios
    into VMEM-resident blocks; this curve shows where throughput saturates
    and where HBM capacity starts to bound the batch."""
    curve = {}
    for b in batches:
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
        point = {
            "solves_per_s": round(b * iters / dt, 1),
            "step_ms": round(1e3 * dt / iters, 1),
        }
        stats = getattr(jax.local_devices()[0], "memory_stats", lambda: None)()
        if stats and stats.get("bytes_limit"):
            point["hbm_gb_in_use"] = round(stats["bytes_in_use"] / 2**30, 2)
        curve[str(b)] = point
    return {"solves_per_s_by_batch": curve}


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


def _perception_in_loop(jax, backend) -> dict:
    """BASELINE config 4, clocked end-to-end: camera frame -> FPN mask ->
    banded track-limit extraction -> centreline refit -> horizon-50 MPC
    replan, chained as ONE jitted device program per frame (the
    reference's per-frame production pipeline,
    /root/reference/src/acmpc/perception/perception.py:244-267 feeding
    control/controller.py:226-231 — there it is two processes over shared
    memory plus an OSQP call; here the mask and centreline never leave
    the device between stages). Driven CLOSED LOOP around a synthetic
    circuit with the shipped trained segmentation weights — the steering
    the car applies comes from the masks the FPN produces — for a full
    lap on TPU, reporting per-frame blocked latency (p50/p99), fps, solve
    success, and how far off the centreline the car ever got."""
    import dataclasses

    import jax.numpy as jnp

    from acmpc_tpu.config import load_config
    from acmpc_tpu.geometry.tracks import offset_boundaries
    from acmpc_tpu.localise.track_map import TrackMap
    from acmpc_tpu.perception.camera import CameraInfo
    from acmpc_tpu.perception.perceiver import Perceiver
    from acmpc_tpu.runtime.sim import SyntheticSimulator

    on_tpu = backend != "cpu"
    cfg = load_config(ROOT / "configs" / "monza.yaml").perception
    # the shipped checkpoint's training camera geometry
    # (tools/train_segmenter.py: height 1.2 m, pitch 9 deg); the FPN is
    # fully convolutional, so on TPU inference runs at the production
    # 1280x736 (BASELINE.md headline config). The CPU fallback drops to
    # the training resolution and a bounded frame count so the bench
    # still completes.
    cfg = dataclasses.replace(
        cfg,
        camera_position=[0.0, 0.0, 1.2],
        camera_pitch_deg=9.0,
        **(
            {}
            if on_tpu
            else dict(
                image_width=320,
                image_height=192,
                n_rows_to_remove_bonnet=160,
                n_polyfit_points=200,
            )
        ),
    )
    perc = Perceiver(cfg)
    mpc = _closed_loop_mpc()
    horizon = mpc.horizon

    # asymmetric closed circuit (~1.3 km): no rotational symmetry, mixed
    # curvature; a full lap exercises both directions of every radius
    theta = np.linspace(0, 2 * np.pi, 1500, endpoint=False)
    r = (
        200.0
        + 30.0 * np.sin(theta)
        + 15.0 * np.sin(2 * theta)
        + 7.0 * np.cos(5 * theta)
    )
    centre = np.stack([r * np.cos(theta), r * np.sin(theta)], axis=1)
    left, right = offset_boundaries(centre, 5.0)
    tm = TrackMap(
        centre=jnp.asarray(centre, jnp.float32),
        left=jnp.asarray(left, jnp.float32),
        right=jnp.asarray(right, jnp.float32),
    )
    lap_m = float(
        np.linalg.norm(np.roll(centre, -1, 0) - centre, axis=1).sum()
    )
    sim = SyntheticSimulator(
        tm, CameraInfo.from_config(cfg), dt=0.05, start_index=0, half_width=5.0
    )

    n_poly = cfg.n_polyfit_points
    ds = max(1, n_poly // horizon)

    def fused(variables, state, image):
        """The whole per-frame pipeline as one XLA program."""
        drivable, _, tracks = perc._run_pipeline(variables, image)
        pts = tracks["centre"][::ds][:horizon]  # static-shape downsample
        if pts.shape[0] < horizon:  # static pad (n_poly < ds*horizon)
            pts = jnp.concatenate(
                [pts, jnp.repeat(pts[-1:], horizon - pts.shape[0], axis=0)]
            )
        # tapered corridor widths, the production control thread's refit
        # (runtime/controller.py::_ControlThread._solve)
        widths = jnp.linspace(10.0, 6.0, horizon, dtype=pts.dtype)
        ref = jnp.stack([pts[:, 0], pts[:, 1], widths], axis=1)
        new_state, diags = mpc.get_control(state, ref)
        return new_state, diags

    step = jax.jit(fused)
    variables = perc.segmenter.variables
    state = mpc.initial_state()
    obs = sim.reset()
    out, _ = step(variables, state, jnp.asarray(obs["image"]))
    jax.block_until_ready(out.projected_control)

    max_frames = 2000 if on_tpu else 40
    times, solved, offtrack = [], 0, 0.0
    d0, n_frames = sim.distance, 0
    k_speed = 0.5  # host actuation: P-term on commanded speed
    for _ in range(max_frames):
        if _remaining_s() < 60:  # in-stage budget guard: the host-side
            # sim render is the slow part of this loop; report the
            # partial lap rather than blow the global deadline mid-stage
            break
        img = jnp.asarray(obs["image"])
        t0 = time.perf_counter()
        out, diags = step(variables, out, img)
        jax.block_until_ready(out.projected_control)
        times.append(time.perf_counter() - t0)
        n_frames += 1
        solved += int(out.solved)
        v_cmd = float(out.projected_control[0, 0])
        delta_cmd = float(out.projected_control[1, 0])
        steering = -delta_cmd / mpc.model.vehicle.max_steering_angle
        dv = k_speed * (v_cmd - sim.v)
        obs = sim.step(
            np.array([steering, max(0.0, -dv), max(0.0, min(dv, 1.0))])
        )
        offtrack = max(
            offtrack,
            float(np.linalg.norm(centre - sim.pose[:2], axis=1).min()),
        )
        if sim.distance - d0 >= lap_m:
            break
    dt_arr = np.asarray(times)
    return {
        "perception_in_loop_p50_ms": round(
            1e3 * float(np.percentile(dt_arr, 50)), 2
        ),
        "perception_in_loop_p99_ms": round(
            1e3 * float(np.percentile(dt_arr, 99)), 2
        ),
        "perception_in_loop_fps": round(
            1.0 / max(float(np.percentile(dt_arr, 50)), 1e-9), 1
        ),
        "perception_in_loop_frames": n_frames,
        "perception_in_loop_solve_success": round(solved / n_frames, 4),
        "perception_in_loop_lap_completed": bool(
            sim.distance - d0 >= lap_m
        ),
        "perception_in_loop_distance_m": round(sim.distance - d0, 1),
        "perception_in_loop_max_offtrack_m": round(offtrack, 2),
        "perception_in_loop_resolution": f"{cfg.image_width}x{cfg.image_height}",
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
    """BASELINE config 1 in closed loop: tracking the SHIPPED raceline +
    the SHIPPED per-point speed profile (data/racelines/*.npz "speeds"
    drives the windowed runtime speed cap, the reference's localised
    map-speed lookup, agent.py:130-143) — plus the experiment that
    settles the uplift question: with the production e_y cost the MPC
    corner-cuts ONLINE so a precomputed line adds ~nothing; tighten the
    e_y step cost 50x (tracking-dominated) and the raceline's geometry
    advantage must reappear. Full-LAP times raceline-vs-centreline live
    in FULL_LAP.json (tools/full_lap.py --compare-raceline)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from acmpc_tpu.bench import LapSweep, SweepGrid
    from acmpc_tpu.mpc.spatial_mpc import SpatialMPC

    line_path = ROOT / "data" / "racelines" / "synth_nordschleife.npz"
    if not line_path.exists():
        return {}
    data = np.load(line_path)
    mpc = _closed_loop_mpc()
    tm, half_width, _ = _bench_map()
    B, N = (256, 25) if backend != "cpu" else (16, 10)

    def run_pair(mpc, with_speeds):
        """(raceline summary, centreline summary) for one cost setting."""
        sweep = LapSweep(
            mpc,
            tm,
            half_width=half_width,
            dt=0.1,
            reference_polyline=data["raceline"],
            reference_widths=data["widths"],
            reference_speeds=data["speeds"] if with_speeds else None,
        )
        # corner-limited comparison: runtime cap 30 so lap speed is set
        # by curvature (and the shipped profile), where the raceline
        # earns its keep
        grid = SweepGrid.perturbed(
            jax.random.PRNGKey(0), B, len(data["raceline"]), v_max=30.0
        )
        grid = grid.replace(v_max=jnp.minimum(grid.v_max, 30.0))
        # the raceline hugs the boundaries: clip each start's lateral
        # offset into ITS corridor (the default +-3 m is instantly
        # illegal where the corridor floor leaves 0.75 m of play)
        margin = mpc.model.margin
        play = (
            jnp.asarray(data["widths"])[grid.start_index] / 2.0 - margin
        ) * 0.8
        grid = grid.replace(
            lateral_offset=jnp.clip(grid.lateral_offset, -play, play)
        )
        _, metrics = sweep.run_fused(grid, N)
        jax.block_until_ready(metrics["v"])
        s = sweep.summarise(metrics, N)

        # the same grid positions tracking the CENTRELINE instead
        centre_sweep = LapSweep(mpc, tm, half_width=half_width, dt=0.1)
        scale = int(tm.centre.shape[0]) / len(data["raceline"])
        cgrid = grid.replace(
            start_index=(
                grid.start_index.astype(jnp.float32) * scale
            ).astype(jnp.int32),
            lateral_offset=jnp.zeros_like(grid.lateral_offset),
        )
        _, cmetrics = centre_sweep.run_fused(cgrid, N)
        jax.block_until_ready(cmetrics["v"])
        return s, centre_sweep.summarise(cmetrics, N)

    s, cs = run_pair(mpc, with_speeds=True)

    # tight-tracking experiment: e_y step cost x50 -> the solver must
    # follow its reference line instead of replanning the corner, so the
    # raceline's geometry advantage shows up (or the corner-cutting
    # explanation was wrong). Same grid, same caps, no speed profile on
    # either side (geometry only).
    tight_cfg = dataclasses.replace(
        mpc.config,
        step_cost=(mpc.config.step_cost[0] * 50.0,)
        + tuple(mpc.config.step_cost[1:]),
    )
    ts, tcs = run_pair(SpatialMPC(tight_cfg, mpc.model), with_speeds=False)

    return {
        "raceline_success_rate": round(s["solve_success_rate"], 4),
        "raceline_mean_speed_ms": round(s["mean_speed_ms"], 2),
        "raceline_p95_offtrack_m": round(s["p95_offtrack_m"], 2),
        "raceline_uses_shipped_speed_profile": True,
        "centreline_mean_speed_ms_at_vmax30": round(cs["mean_speed_ms"], 2),
        "raceline_speed_uplift": round(
            s["mean_speed_ms"] / max(cs["mean_speed_ms"], 1e-9), 4
        ),
        "raceline_speed_uplift_tight_tracking": round(
            ts["mean_speed_ms"] / max(tcs["mean_speed_ms"], 1e-9), 4
        ),
        # the question "is the raceline actually faster" is answered by
        # LAP TIMES, not a 25-step mean-speed ratio at matched caps —
        # surface the committed full-lap comparison (tools/full_lap.py
        # --compare-raceline; < 1.0 means the raceline laps faster)
        **_raceline_lap_time_ratio(),
    }


def _raceline_lap_time_ratio() -> dict:
    full_lap = ROOT / "FULL_LAP.json"
    if not full_lap.exists():
        return {}
    try:
        ratio = json.loads(full_lap.read_text()).get("raceline_lap_time_ratio")
    except Exception:
        return {}
    if ratio is None:
        return {}
    return {"raceline_lap_time_ratio_full_lap": ratio}


if __name__ == "__main__":
    main()
