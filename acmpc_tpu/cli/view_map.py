"""Map viewer / re-smoother CLI (counterpart of
/root/reference/src/acmpc/mapping/view_map.py:10-101): load a map,
optionally re-smooth the boundaries, plot to a PNG, optionally save."""

from __future__ import annotations

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser(description="View / re-smooth a track map")
    parser.add_argument("--map", required=True)
    parser.add_argument("--out", default="map_view.png")
    parser.add_argument(
        "--smooth", type=int, default=0,
        help="re-smooth with this savgol window (0 = off)",
    )
    parser.add_argument("--save", default=None, help="save the re-smoothed map")
    args = parser.parse_args()

    from acmpc_tpu.cli.build_map import plot_map
    from acmpc_tpu.localise.track_map import load_track_map
    from acmpc_tpu.mapping.map_maker import savgol_wrap

    tm = load_track_map(args.map)
    built = {
        "outside_track": np.asarray(tm.left),
        "inside_track": np.asarray(tm.right),
        "centre_track": np.asarray(tm.centre),
    }
    if args.smooth:
        for key in built:
            t = built[key]
            built[key] = np.stack(
                [savgol_wrap(t[:, 0], args.smooth), savgol_wrap(t[:, 1], args.smooth)],
                axis=1,
            )
    plot_map(built, args.out)
    if args.save:
        np.save(args.save, built, allow_pickle=True)
        print(f"saved {args.save}")


if __name__ == "__main__":
    main()
