"""Genuine 2-process ``jax.distributed`` run through the pod launch CLI.

The reference exercises its process fabric on every launch (reference
``src/acmpc/agent.py:335-411`` spawns 5 processes over shared memory);
this framework's distributed fabric is ``jax.distributed`` + a
("host", "chip") mesh (``acmpc_tpu/parallel/multihost.py``). This test
executes that DCN init/mesh/collective path for real: two OS processes,
each owning 2 virtual CPU devices, gloo collectives between them — the
same code path a 2-host TPU pod slice runs, minus the ICI.
"""

from __future__ import annotations

from acmpc_tpu.cli.launch_pod import run_two_process_smoke

import pytest

# multi-minute e2e tier: deselected by default, run via `make test`
pytestmark = pytest.mark.slow


def test_two_process_gloo_pod_sweep():
    summary = run_two_process_smoke()
    assert summary["hosts"] == 2
    assert summary["chips"] == 4
    assert summary["mesh"] == {"host": 2, "chip": 2}
    assert summary["scenarios"] == 8
    # the tiny smoke grid is benign: every solve should succeed
    assert summary["success_rate"] == 1.0
    assert summary["solves_per_s"] > 0


def test_two_process_full_lap_bounded():
    """BASELINE config 5's pod wording — the full-lap endurance sweep
    through the same 2-process jax.distributed path, bounded to a few
    steps so CI stays fast (the committed FULL_LAP.json `pod_2proc`
    section is the full 12,000-step run of this exact code path)."""
    summary = run_two_process_smoke(
        scenarios_per_chip=1, steps=30, full_lap=True
    )
    assert summary["hosts"] == 2
    assert summary["mode"] == "full_lap"
    assert summary["total_solves"] == summary["scenarios"] * 30
    assert summary["solve_success_rate"] == 1.0
    assert summary["completed_laps"] == 0  # 3 s of driving, 22 km lap
