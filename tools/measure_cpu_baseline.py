"""Measure the CPU reference baseline: solves/s of the reference's own
control loop at horizon 50.

BASELINE.md's first measurement task. Runs the reference's actual
``SpatialMPC.get_control`` (/root/reference/src/acmpc/control/
spatial_mpc.py:170-217) — its waypoint construction, speed-profile QP,
linearisation, scipy.sparse QP assembly and control QP — on sliding
centreline windows (the shape of work its ControlProcess does per fresh
centreline, controller.py:226-231, 256-267), for every shipped track
config.

Two numbers per config, both with warm starts carried across solves:

* ``measured_full``  — the loop with the QPs solved by tools/cpu_osqp.py,
  a faithful fp64 scipy-sparse implementation of the public OSQP algorithm
  (the osqp wheel is not installable here). Slower than C OSQP on the
  iteration loop, so NOT used as the denominator.
* ``upper_bound``    — the same loop with both QP ``solve()`` calls
  replaced by cached-result replay (and ``update()`` no-oped). This times
  only the reference's unavoidable per-solve Python/numpy/scipy work and
  is therefore a strict UPPER bound on the reference's achievable
  solves/s — even an infinitely fast QP solver cannot beat it. bench.py
  uses this as the vs_baseline denominator (conservative in the
  reference's favour).

Writes baseline_cpu.json at the repo root. Run: python tools/measure_cpu_baseline.py
"""

from __future__ import annotations

import json
import pathlib
import platform
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tools"))

HORIZON = 50
N_WARMUP = 3
N_TIMED = 40

TRACKS = [
    "monza",
    "spa",
    "silverstone",
    "nordschleife",
    "vallelunga",
    "bathurst",
    "yas_marina",
]


class _ReplaySolver:
    """Stands in for a solver whose answer is already known: ``solve``
    returns the cached result instantly, ``update`` is free. Used for the
    upper-bound measurement (QP cost = 0)."""

    def __init__(self, result):
        self._result = result

    def solve(self):
        return self._result

    def update(self, **_kw):
        pass

    def warm_start(self, **_kw):
        pass


def _sliding_windows(n_windows: int):
    """Windows of a long wavy centreline, advanced one point per solve —
    the reference control loop's input shape (fresh centreline per solve,
    downsampled to `horizon` points with tapered widths,
    controller.py:256-267)."""
    n_total = n_windows + HORIZON + 1
    s = np.linspace(0.0, 60.0, n_total)
    x = 8.0 * np.sin(0.15 * s) + 2.0 * np.sin(0.55 * s)
    y = s * 25.0 / 60.0 * 10.0  # forward progress, ~4 m spacing
    widths = np.linspace(10.0, 6.0, HORIZON)
    out = []
    for i in range(n_windows):
        seg = np.stack([x[i : i + HORIZON], y[i : i + HORIZON]], axis=1)
        seg = seg - seg[0]
        out.append(np.concatenate([seg, widths[:, None]], axis=1))
    return out


def _time_loop(ref_mpc, windows) -> float:
    t0 = time.perf_counter()
    for w in windows:
        ref_mpc.get_control(w)
    return time.perf_counter() - t0


def measure_config(track: str) -> dict:
    from acmpc_tpu.config import load_config
    from reference_bridge import build_reference_mpc

    cfg = load_config(ROOT / "configs" / f"{track}.yaml")
    ref_mpc, _ = build_reference_mpc(cfg.racing_control, cfg.vehicle)
    windows = _sliding_windows(N_WARMUP + N_TIMED)

    # warm-up: compile nothing, but populate OSQP problems + warm starts
    for w in windows[:N_WARMUP]:
        ref_mpc.get_control(w)
    assert ref_mpc.infeasibility_counter == 0, f"{track}: warmup infeasible"

    dt_full = _time_loop(ref_mpc, windows[N_WARMUP:])
    full_sps = N_TIMED / dt_full

    # upper bound: replay-cache both QP solvers -> times only the
    # reference's per-solve Python/scipy work
    control_result = ref_mpc._control_solver._problem.solve()
    speed_result = ref_mpc._speed_profile_solver._problem.solve()
    ref_mpc._control_solver._problem = _ReplaySolver(control_result)
    ref_mpc._speed_profile_solver._problem = _ReplaySolver(speed_result)
    _time_loop(ref_mpc, windows[:N_WARMUP])  # re-warm caches
    dt_ub = _time_loop(ref_mpc, windows[N_WARMUP:])
    ub_sps = N_TIMED / dt_ub

    return {
        "track": track,
        "measured_full_solves_per_s": round(full_sps, 1),
        "upper_bound_solves_per_s": round(ub_sps, 1),
        "ms_per_solve_full": round(1e3 * dt_full / N_TIMED, 3),
        "ms_per_solve_upper_bound": round(1e3 * dt_ub / N_TIMED, 3),
    }


def main():
    per_track = [measure_config(t) for t in TRACKS]
    for row in per_track:
        print(row)
    ub = [r["upper_bound_solves_per_s"] for r in per_track]
    full = [r["measured_full_solves_per_s"] for r in per_track]
    result = {
        "metric": "reference_cpu_solves_per_s_h50",
        "denominator_solves_per_s": round(float(np.mean(ub)), 1),
        "denominator_kind": "upper_bound_mean",
        "measured_full_solves_per_s_mean": round(float(np.mean(full)), 1),
        "method": (
            "Reference get_control (spatial_mpc.py:170-217) driven via "
            "tools/reference_bridge.py on sliding horizon-50 centreline "
            "windows, warm-started, all 7 track configs. osqp wheel "
            "unavailable: 'measured_full' uses a faithful fp64 scipy "
            "implementation of the public OSQP algorithm "
            "(tools/cpu_osqp.py); the denominator is the UPPER BOUND "
            "variant with QP solve() replaced by cached-result replay, "
            "i.e. the reference's per-solve Python/scipy work alone — a "
            "strict ceiling on its throughput regardless of QP solver "
            "speed."
        ),
        "horizon": HORIZON,
        "n_solves_timed_per_track": N_TIMED,
        "machine": {
            "processor": platform.processor() or platform.machine(),
            "platform": platform.platform(),
            "python": platform.python_version(),
        },
        "per_track": per_track,
    }
    out = ROOT / "baseline_cpu.json"
    out.write_text(json.dumps(result, indent=2) + "\n")
    print(f"\nwrote {out}")
    print(
        f"denominator (upper bound): {result['denominator_solves_per_s']} "
        f"solves/s; faithful full loop: "
        f"{result['measured_full_solves_per_s_mean']} solves/s"
    )


if __name__ == "__main__":
    main()
