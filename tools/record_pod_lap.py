"""Record the POD-FORM full-lap endurance artifact (BASELINE config 5:
"nordschleife full-lap pod sweep ... across N>=2 hosts").

Round 3's FULL_LAP.json was single-process; this drives the SAME
endurance sweep through the real 2-process ``jax.distributed`` (gloo)
path — ``cli/launch_pod.py --full-lap`` via ``run_two_process_smoke`` —
so config 5's multi-host wording is exercised by the exact CLI a real
pod would run. CPU-scale (2 processes x 2 virtual devices), reduced
scenario count; the per-chip program is identical to the single-chip
endurance run.

Merges a "pod_2proc" section into FULL_LAP.json.

Run:  python tools/record_pod_lap.py [--steps 12000]
      [--scenarios-per-chip 1] [--out FULL_LAP.json]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=12000, help="lap-step cap")
    ap.add_argument("--scenarios-per-chip", type=int, default=1)
    ap.add_argument(
        "--map", default=str(ROOT / "data/maps/synth_nordschleife.npy")
    )
    ap.add_argument("--timeout", type=int, default=5400)
    ap.add_argument("--out", default=str(ROOT / "FULL_LAP.json"))
    args = ap.parse_args()

    from acmpc_tpu.cli.launch_pod import run_two_process_smoke

    summary = run_two_process_smoke(
        scenarios_per_chip=args.scenarios_per_chip,
        steps=args.steps,
        timeout=args.timeout,
        full_lap=True,
        map_path=args.map,
    )
    assert summary["hosts"] == 2, summary
    assert summary["mode"] == "full_lap", summary

    out_path = pathlib.Path(args.out)
    artifact = json.loads(out_path.read_text()) if out_path.exists() else {}
    artifact["pod_2proc"] = summary
    out_path.write_text(json.dumps(artifact, indent=2) + "\n")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
