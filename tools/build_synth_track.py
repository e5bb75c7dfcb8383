"""Build a realistic full-length track map THROUGH the mapping pipeline.

BASELINE config 5 needs a nordschleife-scale map; the reference ships its
maps as downloadable assets (scripts/download_assets.sh) built by driving
mapping laps. Zero egress here, so this tool synthesises a ~20 km circuit
from a band-limited random curvature profile (hairpins down to ~25 m
radius through fast sweepers), then builds the shipped map the same way
the agent's mapping mode does: per-frame BEV boundary observations in the
game pose convention -> MapMaker.process_segmentation_tracks ->
save_map (TSP ordering, savgol smoothing, 0.5 m upsampling, dedup —
reference map_maker.py:132-225).

Run:  python tools/build_synth_track.py [--length 20000] [--out data/maps/synth_nordschleife.npy]
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def generate_centreline(
    length_m: float = 20000.0,
    step_m: float = 2.0,
    seed: int = 7,
    kappa_max: float = 1.0 / 25.0,
):
    """Closed circuit from a smooth random curvature profile.

    kappa(s): band-limited noise (knots every ~150 m, cubic-smooth via
    cosine interpolation), scaled so the tightest corners hit ~kappa_max,
    shifted so the heading closes (integral = 2 pi), position closure by
    linear drift removal.
    """
    rng = np.random.default_rng(seed)
    n = int(length_m / step_m)
    s = np.arange(n) * step_m

    knot_spacing = 150.0
    n_knots = int(length_m / knot_spacing)
    knots = rng.normal(size=n_knots)
    # periodic cosine-smooth interpolation of the knot sequence
    pos = s / knot_spacing
    i0 = np.floor(pos).astype(int) % n_knots
    i1 = (i0 + 1) % n_knots
    t = pos - np.floor(pos)
    w = 0.5 - 0.5 * np.cos(np.pi * t)
    kappa = knots[i0] * (1 - w) + knots[i1] * w
    # occasional tight corners: emphasise the tails, keep the straights
    kappa = np.sign(kappa) * np.abs(kappa) ** 2.2
    kappa = kappa / np.abs(kappa).max() * kappa_max
    # heading closure: total turn must be exactly 2 pi
    kappa = kappa + (2.0 * np.pi - np.sum(kappa) * step_m) / length_m

    psi = np.cumsum(kappa) * step_m
    x = np.cumsum(np.cos(psi)) * step_m
    y = np.cumsum(np.sin(psi)) * step_m
    # position closure: remove the linear drift of the endpoint gap
    gap = np.array([x[-1] - x[0], y[-1] - y[0]])
    frac = np.arange(n) / n
    x = x - gap[0] * frac
    y = y - gap[1] * frac
    centre = np.stack([x, y], axis=1)
    return centre, psi


def boundaries(centre: np.ndarray, half_width: float = 4.75):
    d = np.roll(centre, -1, axis=0) - centre
    t = d / np.linalg.norm(d, axis=1, keepdims=True)
    n = np.stack([-t[:, 1], t[:, 0]], axis=1)
    return centre + half_width * n, centre - half_width * n


def drive_mapping_pipeline(
    centre: np.ndarray,
    left: np.ndarray,
    right: np.ndarray,
    out_path: str,
    frame_spacing_m: float = 2.0,
    lookahead: int = 4,
):
    """Synthesise the mapping drive: one BEV observation per
    frame_spacing_m of progress, fed through the production MapMaker in
    the game pose convention the agent uses (sim.py _observation /
    map_maker.map_world_pose_xy)."""
    from acmpc_tpu.mapping.map_maker import MapMaker, TRIM_STATIONARY

    mm = MapMaker()
    n = len(centre)
    step = max(1, int(frame_spacing_m / np.linalg.norm(centre[1] - centre[0])))
    idxs = list(range(0, n, step))
    # overlap the start so the stationary trim doesn't cut map coverage
    idxs += list(range(0, TRIM_STATIONARY * 2 * step, step))
    for i in idxs:
        p = centre[i]
        nxt = centre[(i + 1) % n]
        psi = np.arctan2(nxt[1] - p[1], nxt[0] - p[0])
        yaw_t = np.pi / 2 - psi  # sim.py heading convention
        c, s = np.cos(yaw_t), np.sin(yaw_t)
        R = np.array([[c, -s], [s, c]])
        pose = {"x": -p[0], "z": p[1], "translation_yaw": yaw_t}
        sel = [(i + k) % n for k in range(0, lookahead * step, step)]
        lb = (R @ (left[sel] - p).T).T
        rb = (R @ (right[sel] - p).T).T
        cb = (R @ (centre[sel] - p).T).T
        mm.process_segmentation_tracks(pose, lb, rb, cb)
    return mm.save_map(out_path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--length", type=float, default=20000.0)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument(
        "--out", default=str(ROOT / "data" / "maps" / "synth_nordschleife.npy")
    )
    args = ap.parse_args()

    centre, _ = generate_centreline(args.length, seed=args.seed)
    left, right = boundaries(centre)
    seg = np.linalg.norm(np.diff(centre, axis=0), axis=1)
    d = np.diff(centre, axis=0)
    psi = np.unwrap(np.arctan2(d[:, 1], d[:, 0]))
    kappa = np.abs(np.diff(psi)) / seg[1:]
    print(
        f"generated circuit: {seg.sum() / 1000:.2f} km, "
        f"tightest corner radius {1.0 / max(kappa.max(), 1e-9):.0f} m"
    )
    pathlib.Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    built = drive_mapping_pipeline(centre, left, right, args.out)
    print(
        f"built map: centre {len(built['centre_track'])} pts, "
        f"inside {len(built['inside_track'])}, outside {len(built['outside_track'])}"
    )
    # verification vs ground truth
    from scipy.spatial import cKDTree

    tree = cKDTree(centre)
    d, _ = tree.query(built["centre_track"])
    print(
        f"centre error vs ground truth: median {np.median(d):.2f} m, "
        f"p95 {np.percentile(d, 95):.2f} m"
    )
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
