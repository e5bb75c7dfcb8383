"""Raceline calculator CLI (counterpart of
/root/reference/src/acmpc/utils/raceline_calculator.py:131-212): compute a
minimum-curvature raceline for a track map and save/plot it."""

from __future__ import annotations

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser(description="Compute a raceline for a map")
    parser.add_argument("--map", required=True)
    parser.add_argument("--out", required=True, help="output .npy raceline")
    parser.add_argument("--margin", type=float, default=1.0)
    parser.add_argument(
        "--iterations", type=int, default=3,
        help="number of curvature re-linearisations (each solves one QP)",
    )
    parser.add_argument("--plot", default=None)
    args = parser.parse_args()

    from acmpc_tpu.localise.track_map import load_track_map
    from acmpc_tpu.utils.raceline import calculate_raceline

    tm = load_track_map(args.map)
    centre = np.asarray(tm.centre)
    # cap the optimisation size: the QP is dense in the point count, and
    # ~600 points resolve any lap's raceline; upsampling happens via the
    # mapping tools if a denser line is needed
    max_points = 600
    if len(centre) > max_points:
        stride = int(np.ceil(len(centre) / max_points))
        centre = centre[::stride]
    left = np.asarray(tm.left)
    # per-point half width from the nearest boundary point
    d2 = (
        np.sum(centre**2, 1)[:, None]
        - 2 * centre @ left.T
        + np.sum(left**2, 1)[None, :]
    )
    half_width = np.sqrt(np.maximum(d2.min(axis=1), 0.0))
    raceline = calculate_raceline(
        centre, half_width, margin=args.margin, n_iterations=args.iterations
    )
    np.save(args.out, raceline)
    print(f"wrote raceline with {len(raceline)} points to {args.out}")
    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(10, 10), dpi=150)
        ax.plot(*np.asarray(tm.left).T, ".", ms=1, label="left")
        ax.plot(*np.asarray(tm.right).T, ".", ms=1, label="right")
        ax.plot(*raceline.T, "-", lw=1.5, color="red", label="raceline")
        ax.set_aspect(1)
        ax.legend()
        fig.savefig(args.plot)
        print(f"wrote {args.plot}")


if __name__ == "__main__":
    main()
