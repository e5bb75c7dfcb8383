"""Build a realistic full-length track map THROUGH the mapping pipeline.

BASELINE config 5 needs a nordschleife-scale map; the reference ships its
maps as downloadable assets (scripts/download_assets.sh) built by driving
mapping laps. Zero egress here, so this tool synthesises a ~22 km simple
closed circuit (star-shaped polar harmonics, corners down to ~46 m radius
through fast sweepers — see generate_centreline for why it must be simple
by construction), then builds the shipped map the same way the agent's
mapping mode does: per-frame BEV boundary observations in the game pose
convention -> MapMaker.process_segmentation_tracks -> save_map (TSP
ordering, savgol smoothing, fold removal + uniform 0.5 m arc-length
resampling — reference map_maker.py:132-225).

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
    target_min_radius: float = 55.0,
):
    """Closed circuit that is a SIMPLE curve by construction.

    A band-limited random curvature profile is NOT self-avoiding — at
    20 km every seed self-intersects, and a self-crossing circuit breaks
    the mapping tour (it legitimately shortcuts across the pinch). Use a
    star-shaped polar curve instead: r(theta) = R0 + sum of random
    harmonics (k = 2..80, 1/k^1.3 amplitude decay), which cannot
    self-intersect for r > 0 and single-valued theta. The harmonic scale
    is grown geometrically until the tightest corner reaches
    ``target_min_radius`` — ~50 m hairpin-adjacent corners through
    ~500 m sweepers at nordschleife length. Output is resampled to
    uniform ``step_m`` arc spacing.
    """
    rng = np.random.default_rng(seed)
    ks = np.arange(2, 81)
    amps = rng.normal(size=len(ks)) / ks**1.3
    phis = rng.uniform(0, 2 * np.pi, len(ks))
    r0 = length_m / (2 * np.pi)
    theta = np.linspace(0, 2 * np.pi, 20000, endpoint=False)
    wave = np.sum(
        amps[:, None] * np.cos(ks[:, None] * theta[None] + phis[:, None]),
        axis=0,
    )
    centre = None
    for scale in np.geomspace(1.0, 2000.0, 40):
        r = r0 + scale * wave
        if r.min() < 0.2 * r0:
            break
        c = np.stack([r * np.cos(theta), r * np.sin(theta)], axis=1)
        d = np.diff(np.vstack([c, c[:1]]), axis=0)
        seg = np.linalg.norm(d, axis=1)
        psi = np.unwrap(np.arctan2(d[:, 1], d[:, 0]))
        kappa = np.abs(np.diff(psi)) / seg[1:]
        centre = c
        if 1.0 / max(kappa.max(), 1e-9) < target_min_radius:
            break
    assert centre is not None, "polar circuit generation failed"

    # uniform arc-length resampling at step_m
    closed = np.vstack([centre, centre[:1]])
    seg = np.linalg.norm(np.diff(closed, axis=0), axis=1)
    s = np.concatenate([[0.0], np.cumsum(seg)])
    si = np.linspace(0.0, s[-1], int(s[-1] / step_m), endpoint=False)
    centre = np.stack(
        [np.interp(si, s, closed[:, 0]), np.interp(si, s, closed[:, 1])],
        axis=1,
    )
    d = np.diff(np.vstack([centre, centre[:1]]), axis=0)
    psi = np.arctan2(d[:, 1], d[:, 0])
    return centre, psi


def boundaries(centre: np.ndarray, half_width: float = 4.75):
    from acmpc_tpu.geometry.tracks import offset_boundaries

    return offset_boundaries(centre, half_width)


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
    # simplicity check: no non-adjacent self-approach under 30 m (the
    # mapping tour shortcuts across pinches tighter than that)
    from scipy.spatial import cKDTree

    pairs = cKDTree(centre).query_pairs(r=30.0, output_type="ndarray")
    if len(pairs):
        along = np.abs(pairs[:, 0] - pairs[:, 1])
        along = np.minimum(along, len(centre) - along)
        assert (along <= 30).all(), "circuit has a self-approach under 30 m"
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
