"""Offline localisation benchmark CLI.

Counterpart of /root/reference/src/acmpc/benchmark_localisation.py:9-35:
replay a recorded control+observation stream through the particle filter
and print % localised / mean position error / mean rotation error.
"""

from __future__ import annotations

import argparse
import json


def main():
    parser = argparse.ArgumentParser(
        description="Replay a localisation recording and report accuracy"
    )
    parser.add_argument("--config", required=True, help="track config yaml")
    parser.add_argument(
        "--data", required=True, help="directory with control.npy + observations.npy"
    )
    parser.add_argument("--map", default=None, help="override map path")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    from acmpc_tpu.config import load_config
    from acmpc_tpu.localise.benchmarking import BenchmarkLocalisation

    cfg = load_config(args.config)
    bench = BenchmarkLocalisation(
        data_path=args.data,
        map_path=args.map or cfg.map_path,
        localisation_cfg=cfg.localisation,
        vehicle=cfg.vehicle,
        seed=args.seed,
    )
    summary = bench.run()
    print(json.dumps(summary, indent=2))
    print(
        f"Percentage of time localised: {summary['percent_localised']:.1f}%\n"
        f"Average position error: {summary['mean_position_error_m']:.2f} m\n"
        f"Average rotation error: {summary['mean_rotation_error_deg']:.2f} deg"
    )


if __name__ == "__main__":
    main()
