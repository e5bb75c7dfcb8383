"""Build the full per-track asset set the configs point at.

Counterpart of the reference's asset pipeline
(/root/reference/scripts/download_assets.sh — 7 maps, racelines and car
setups fetched from a host): zero egress here, so every asset is BUILT by
the framework's own tools instead of downloaded:

  data/maps/<track>.npz          track map, driven through the REAL
                                 mapping pipeline (MapMaker) on a
                                 track-length synthetic circuit
  data/racelines/<track>.npz     minimum-curvature raceline (the ADMM
                                 raceline QP, utils/raceline.py) + the
                                 map-scale speed profile along it
                                 (qp/speed_profile.py) — BASELINE
                                 config 1's "shipped raceline + speed
                                 profile"

Run:  python tools/build_assets.py [--tracks monza spa ...] [--quick]
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tools"))

# real-world lap lengths (km) and a seed per track so each circuit is a
# distinct, reproducible synthetic stand-in at the right scale
TRACKS = {
    "monza": (5.79, 11),
    "spa": (7.00, 12),
    "silverstone": (5.89, 13),
    "nordschleife": (20.8, 7),
    "vallelunga": (4.09, 14),
    "bathurst": (6.21, 15),
    "yas_marina": (5.28, 16),
}


def build_map(track: str, length_km: float, seed: int, out: pathlib.Path):
    import tempfile

    from build_synth_track import boundaries, drive_mapping_pipeline, generate_centreline

    from acmpc_tpu.localise.track_map import save_track_map

    centre, _ = generate_centreline(length_km * 1000.0, seed=seed)
    left, right = boundaries(centre)
    # the mapping pipeline writes the reference .npy layout + raw points;
    # only the native .npz is shipped per track (synth_nordschleife keeps
    # the reference layout as the compat fixture)
    with tempfile.TemporaryDirectory() as tmp:
        built = drive_mapping_pipeline(
            centre, left, right, str(pathlib.Path(tmp) / f"{track}.npy")
        )
    save_track_map(
        out,
        built["centre_track"],
        built["inside_track"],
        built["outside_track"],
    )
    return built


def build_raceline(track: str, map_path: pathlib.Path, out: pathlib.Path):
    import jax.numpy as jnp

    from acmpc_tpu.config import load_config
    from acmpc_tpu.geometry.path import construct_waypoints
    from acmpc_tpu.localise.track_map import load_track_map
    from acmpc_tpu.qp.speed_profile import solve_speed_profile
    from acmpc_tpu.utils.raceline import calculate_raceline

    from acmpc_tpu.mapping.map_maker import resample_uniform

    cfg_path = ROOT / "configs" / f"{track}.yaml"
    if cfg_path.exists():
        constraints = load_config(cfg_path).racing_control.constraints
    else:
        # synth_nordschleife: the bench's closed-loop constraint family
        # (bench.py::_closed_loop_mpc), v_max 32 so the shipped profile
        # (not the sweep grid) sets the cap in full-lap comparisons
        from acmpc_tpu.qp.speed_profile import SpeedProfileConstraints

        constraints = SpeedProfileConstraints(
            v_min=5.0, v_max=32.0, a_min=-3.0, a_max=6.0,
            ay_max=5.5, ki_min=0.005, end_velocity=None,
        )
    tm = load_track_map(map_path)
    centre = np.asarray(tm.centre)
    left = np.asarray(tm.left)
    right = np.asarray(tm.right)
    # the raceline QP is dense, but the sample spacing bounds how far the
    # resampled line chord-cuts past the optimised offsets (error ~
    # ds^2 kappa / 8, which must stay inside the 1 m optimisation
    # margin) — ~11 m spacing keeps it under 0.3 m on 50 m corners
    stride = max(1, len(centre) // 1800)
    centre_ds = centre[::stride]

    def min_dist(pts, poly, chunk=2048):
        outd = np.empty(len(pts))
        for i in range(0, len(pts), chunk):
            d = np.linalg.norm(
                pts[i : i + chunk, None, :] - poly[None, ::4, :], axis=-1
            )
            outd[i : i + chunk] = d.min(axis=1)
        return outd

    half_width = float(np.median(min_dist(centre_ds, left)))
    _, alpha_ds = calculate_raceline(
        jnp.asarray(centre_ds, jnp.float32),
        half_width=half_width,
        margin=1.0,
        n_iterations=3,
        return_alpha=True,
    )
    # Transfer the smooth lateral offset onto the DENSE centreline, not
    # the coarse optimised polyline: linearly resampling an ~11 m-spaced
    # polygon to 2 m leaves a chord kink at every coarse vertex, and the
    # discretised curvature there (turn angle / fine segment) reads as
    # spikes several times the track's true curvature — the speed
    # profile braked for phantom corners and the shipped "minimum
    # curvature" line measured MORE curved than the centreline it
    # started from (k_p95 0.023 vs 0.009, +22 s/lap on the bench map).
    # alpha varies over hundreds of metres, so arclength-interpolating
    # it (plus a savgol pass to round the knot creases) and riding the
    # dense geometry keeps the line's curvature faithful.
    from acmpc_tpu.mapping.map_maker import savgol_wrap
    from acmpc_tpu.utils.raceline import _unit_normals

    def arc(pts):
        seg = np.linalg.norm(np.diff(pts, axis=0), axis=1)
        return np.concatenate([[0.0], np.cumsum(seg)])

    s_ds = arc(np.vstack([centre_ds, centre_ds[:1]]))
    # both arclength parameterisations must cover the CLOSED loop: using
    # the open dense arc (which omits the closing segment) phase-stretches
    # alpha by one dense spacing with the largest offset at the seam
    s_dense_closed = arc(np.vstack([centre, centre[:1]]))
    s_dense = s_dense_closed[:-1]
    alpha_dense = np.interp(
        s_dense * (s_ds[-1] / max(s_dense_closed[-1], 1e-9)),
        s_ds,
        np.concatenate([alpha_ds, alpha_ds[:1]]),
    )
    window = min(2 * stride + 1, (len(alpha_dense) - 1) | 1)
    alpha_dense = savgol_wrap(alpha_dense, window=window, closed=True)
    normals_dense = np.asarray(_unit_normals(jnp.asarray(centre, jnp.float32)))
    line = centre + alpha_dense[:, None] * normals_dense
    # dense 2 m arc spacing: the closed-loop tracker extracts horizon
    # windows from this polyline, and coarse spacing wrecks the
    # discretised curvature it feeds the QP
    line = resample_uniform(line.astype(np.float64), spacing=2.0)

    # symmetric drivable corridor around the raceline (it hugs the
    # boundaries, so the corridor narrows there); floored so the e_y box
    # keeps some play beyond the vehicle margin
    margin = 0.97
    widths = 2.0 * np.minimum(min_dist(line, left), min_dist(line, right))
    widths = np.maximum(widths, 2.0 * (margin + 0.75))

    # map-scale speed profile ALONG THE RACELINE with the map overrides
    coords = np.concatenate([line, widths[:, None]], axis=1)
    path = construct_waypoints(jnp.asarray(coords, jnp.float32))
    sol = solve_speed_profile(
        path.distances,
        path.kappas,
        constraints,
        v_max_runtime=constraints.v_max,
        localised=False,
        use_end_velocity=False,
    )
    speeds = np.asarray(sol.velocities)
    np.savez(
        out,
        raceline=line.astype(np.float32),
        speeds=speeds.astype(np.float32),
        widths=widths.astype(np.float32),
        half_width=np.float32(half_width),
    )
    return line, speeds


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tracks", nargs="*", default=list(TRACKS))
    ap.add_argument(
        "--quick", action="store_true",
        help="shrink every circuit to 2 km (CI smoke)",
    )
    ap.add_argument(
        "--racelines-only", action="store_true",
        help="rebuild racelines + speed profiles from the EXISTING maps "
        "(keeps the shipped map geometry, and with it every recording "
        "and golden fixture that references it)",
    )
    args = ap.parse_args()

    maps_dir = ROOT / "data" / "maps"
    lines_dir = ROOT / "data" / "racelines"
    maps_dir.mkdir(parents=True, exist_ok=True)
    lines_dir.mkdir(parents=True, exist_ok=True)

    if args.racelines_only and args.tracks == list(TRACKS):
        args.tracks = list(TRACKS) + ["synth_nordschleife"]

    for track in args.tracks:
        map_path = maps_dir / f"{track}.npz"
        if not map_path.exists():
            map_path = maps_dir / f"{track}.npy"
        if args.racelines_only:
            assert map_path.exists(), f"no shipped map for {track}"
        else:
            length_km, seed = TRACKS[track]
            if args.quick:
                length_km = 2.0
            map_path = maps_dir / f"{track}.npz"
            built = build_map(track, length_km, seed, map_path)
        line, speeds = build_raceline(
            track, map_path, lines_dir / f"{track}.npz"
        )
        if args.racelines_only:
            print(
                f"{track}: raceline {len(line)} pts, "
                f"speeds [{speeds.min():.1f}, {speeds.max():.1f}] m/s"
            )
        else:
            print(
                f"{track}: map {len(built['centre_track'])} pts "
                f"({length_km:.1f} km), raceline {len(line)} pts, "
                f"speeds [{speeds.min():.1f}, {speeds.max():.1f}] m/s"
            )


if __name__ == "__main__":
    main()
