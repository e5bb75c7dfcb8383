"""Benchmark: MPC solves/s per chip at full racing horizon (H=50).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The scenario batch is solved as one jitted, vmapped program (the TPU-native
replacement for the reference's per-step OSQP loop in
/root/reference/src/acmpc/control/controller.py:226-231). Baseline
denominator: the reference's CPU OSQP re-solve loop at horizon 50. The
reference repo records no numbers (BASELINE.md) — its harness only printed
per-solve wall times — so we pin the denominator to 500 solves/s (2 ms per
warm-started 248-variable OSQP solve, the order its test harness printed on
desktop CPUs; see /root/reference/src/acmpc/tests/test_spatial_mpc.py:85-87).
"""

from __future__ import annotations

import json
import time

import numpy as np

# Reference CPU loop estimate: 2 ms/solve warm OSQP at horizon 50.
CPU_BASELINE_SOLVES_PER_S = 500.0

HORIZON = 50


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge

    backend = jax.default_backend()
    n_dev = jax.device_count()
    batch = 256 if backend != "cpu" else 32

    mpc = ge._make_mpc(HORIZON)
    # mixed difficulty: half gentle curves, half hairpins (feasible at H=50)
    from acmpc_tpu.geometry.tracks import get_hairpin_track, with_widths

    gentle = np.asarray(ge._reference_window(HORIZON, batch // 2))
    hard = np.stack(
        [
            with_widths(get_hairpin_track(30.0 + 2.0 * i, HORIZON))
            for i in range(batch - batch // 2)
        ]
    )
    refs = jnp.asarray(np.concatenate([gentle, hard]), jnp.float32)

    states = jax.vmap(lambda: mpc.initial_state(), axis_size=batch)()
    step = jax.jit(jax.vmap(lambda s, r: mpc.get_control(s, r)[0]))

    # warmup / compile
    out = step(states, refs)
    jax.block_until_ready(out.projected_control)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(out, refs)
    jax.block_until_ready(out.projected_control)
    dt = time.perf_counter() - t0

    solves_per_s = batch * iters / dt
    per_chip = solves_per_s / 1  # single-chip benchmark (bench runs on 1 chip)
    result = {
        "metric": f"mpc_solves_per_s_per_chip_h{HORIZON}",
        "value": round(per_chip, 2),
        "unit": "solves/s",
        "vs_baseline": round(per_chip / CPU_BASELINE_SOLVES_PER_S, 3),
        "backend": backend,
        "batch": batch,
        "n_devices": n_dev,
        "p50_step_latency_ms": round(1e3 * dt / iters, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
