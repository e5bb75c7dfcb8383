"""Track-limit extraction: drivable mask -> left/right boundaries ->
BEV centreline.

The reference's primary path walks OpenCV contours with three gap-splitting
strategies and falls back to a per-row argmin/argmax scan on failure
(/root/reference/src/acmpc/perception/tracks.py:24-252). On TPU that
fallback form IS the right primary algorithm: per-row leftmost/rightmost
drivable-column extraction is a fixed-shape vectorised reduction over the
mask, which fuses with the segmentation argmax into one device program —
no host round-trip, no dynamic contour shapes. The downstream processing
(homography to ground, BEV field-of-view crop, degree-2 weighted polyfit,
centreline with origin stub) mirrors the reference numerics exactly
(tracks.py:211-252, perception/utils.py:107-119).

Everything is masked fixed-shape jnp: rows with no track pixels carry a
zero weight into the polyfit instead of being dropped.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from acmpc_tpu.config.schema import PerceptionConfig
from acmpc_tpu.perception.camera import CameraInfo

# BEV field of view crop (reference tracks.py:13-14)
BEV_X_MAX = 50.0
BEV_X_MIN = -50.0
BEV_Y_MAX = 150.0
BEV_Y_MIN = 0.0
N_ORIGIN_STUB = 10  # origin stub points prepended to the centreline


@dataclasses.dataclass(frozen=True)
class TrackExtractionConfig:
    image_width: int
    image_height: int
    n_polyfit_points: int
    n_rows_to_remove_bonnet: int
    track_width_if_missing: float = 9.0  # utils/track_limit_interpolation.py
    # isolate the vehicle-connected run chain before edge extraction (the
    # contour/split-strategy counterpart; see select_vehicle_connected_runs)
    connected_runs: bool = True
    # rows per connectivity-scan step (sequential-latency control; see
    # select_vehicle_connected_runs band semantics)
    connectivity_band: int = 4

    @classmethod
    def from_config(cls, cfg: PerceptionConfig) -> "TrackExtractionConfig":
        return cls(
            image_width=cfg.image_width,
            image_height=cfg.image_height,
            n_polyfit_points=cfg.n_polyfit_points,
            n_rows_to_remove_bonnet=cfg.n_rows_to_remove_bonnet,
        )


def select_vehicle_connected_runs(
    mask: jnp.ndarray,
    bonnet_row: int,
    gap_tolerance: int = 3,
    band: int = 1,
) -> jnp.ndarray:
    """Keep only the drivable run chain vertically connected to the
    vehicle — the TPU-native counterpart of the reference's contour
    extraction + split strategies + monotone-y filtering
    (reference tracks.py:38-178).

    Why: per-row leftmost/rightmost edges (the reference's own fallback,
    tracks.py:180-194) break when a raster row crosses the track twice —
    a hairpin filling the view puts the near leg AND the far leg on the
    same row, so the right edge jumps to the far leg and the polyfit fits
    garbage. The reference walks the track contour instead; contours are
    dynamic-shaped host work, so here the same semantics come from a
    fixed-shape bottom-up scan:

    * seed at the last row above the bonnet, on the run(s) touching the
      central third of the image (where the ego vehicle looks);
    * each row up, keep only the runs that overlap the previous row's
      selection (run spread via a segment-max over run ids);
    * a break in connectivity longer than ``gap_tolerance`` rows kills
      the chain — exactly the monotone-y truncation at a hairpin apex;
    * disconnected blobs (other track segments, noise) are never reached.

    Returns a filtered 0/1 mask of the same shape. Falls back to the
    input mask when the seed finds nothing (caller keeps the reference's
    naive-fallback semantics).

    ``band > 1`` coarsens the SEQUENTIAL dimension: connectivity runs on
    the OR of each ``band``-row block, and the block selection is then
    ANDed back with the full-resolution mask. The scan is the latency
    hot spot of the whole perception pipeline (736 sequential steps cost
    ~15 ms of launch latency at camera resolution — more than the FPN
    forward pass); banding divides the step count while keeping row-edge
    extraction exact wherever the blob is thicker than a band (a track
    always is). Semantics shift only at band granularity: gaps shorter
    than a band are bridged and the gap tolerance rounds to whole bands.
    """
    H, W = mask.shape
    row_bool = mask > 0
    usable = row_bool & (jnp.arange(H) < bonnet_row)[:, None]

    if band > 1:
        hb = -(-H // band)
        padded = jnp.pad(usable, ((0, hb * band - H), (0, 0)))
        bands = padded.reshape(hb, band, W).any(axis=1)
        gap_bands = max(1, round(gap_tolerance / band))
        sel_bands = _chain_scan(bands, gap_bands)
        sel = jnp.repeat(sel_bands, band, axis=0)[:H] & usable
    else:
        sel = _chain_scan(usable, gap_tolerance) & usable

    any_selected = jnp.any(sel)
    return jnp.where(any_selected, sel, row_bool).astype(mask.dtype)


def _chain_scan(rows: jnp.ndarray, gap_tolerance: int) -> jnp.ndarray:
    """Bottom-up connected-run chain over (N, W) boolean rows: seed at
    the lowest non-empty row on the central third, keep runs overlapping
    the previous selection, die after ``gap_tolerance`` consecutive
    empty rows once started."""
    n, w = rows.shape
    central = jnp.zeros((w,), bool).at[w // 3 : 2 * w // 3].set(True)
    rev = rows[::-1]

    def spread(seeds, row, run_id):
        """Expand seed pixels to their full drivable runs."""
        m = jax.ops.segment_max(
            seeds.astype(jnp.int32), run_id, num_segments=w + 1
        )
        return row & (m[run_id] > 0)

    def step(carry, row):
        prev_sel, started, dead, miss = carry
        run_id = jnp.cumsum(~row)
        seeds = jnp.where(started, row & prev_sel, row & central)
        sel = spread(seeds, row, run_id)
        sel = jnp.where(dead, jnp.zeros_like(sel), sel)
        has = jnp.any(sel)
        started_n = started | has
        miss_n = jnp.where(
            has | ~started_n, jnp.where(has, 0, miss), miss + 1
        )
        dead_n = dead | (miss_n > gap_tolerance)
        prev_n = jnp.where(has, sel, prev_sel)
        return (prev_n, started_n, dead_n, miss_n), sel

    init = (
        jnp.zeros((w,), bool),
        jnp.asarray(False),
        jnp.asarray(False),
        jnp.asarray(0, jnp.int32),
    )
    (_, _, _, _), sel_rev = jax.lax.scan(step, init, rev)
    return sel_rev[::-1]


def row_edge_columns(mask: jnp.ndarray):
    """Per-row leftmost/rightmost drivable column (the vectorised form of
    reference tracks.py:180-194). mask: (H, W) 0/1. Returns
    (left_cols, right_cols, row_valid)."""
    w = mask.shape[1]
    ascending = jnp.arange(1, w + 1, dtype=jnp.int32)
    weighted = mask.astype(jnp.int32) * ascending[None, :]
    right = jnp.argmax(weighted, axis=1)
    sentinel = jnp.where(weighted == 0, w + 1, weighted)
    left = jnp.argmin(sentinel, axis=1)
    row_valid = jnp.any(mask > 0, axis=1)
    return left, right, row_valid


def _edge_validity(cols, rows, row_valid, cfg: TrackExtractionConfig):
    """Reference filters: drop columns touching the image edge and rows at
    or below the bonnet line (tracks.py:187-194)."""
    return (
        row_valid
        & (cols != 0)
        & (cols != cfg.image_width - 1)
        & (rows < cfg.n_rows_to_remove_bonnet)
    )


def _image_to_ground(cols, rows, homography_i2w: jnp.ndarray):
    pts = jnp.stack(
        [cols.astype(jnp.float32), rows.astype(jnp.float32), jnp.ones_like(cols, jnp.float32)],
        axis=0,
    )
    g = homography_i2w @ pts
    return (g[:2] / g[2]).T  # (H, 2) ground xy


def _bev_fov_mask(points, valid):
    return (
        valid
        & (points[:, 0] > BEV_X_MIN)
        & (points[:, 0] < BEV_X_MAX)
        & (points[:, 1] > BEV_Y_MIN)
        & (points[:, 1] < BEV_Y_MAX)
    )


def masked_polyfit_track(points, weights, n_out: int):
    """Weighted degree-2 polyfit x = p(y), evaluated exactly the way the
    reference's smooth_track_with_polyfit does (perception/utils.py:107-119):
    evaluate on 500 points over [0, y_max], restart from the sample closest
    to the origin, then emit n_out points to y_max.

    Falls back to the reference's default straight stub when no points are
    valid."""
    y = points[:, 1]
    x = points[:, 0]
    w = weights.astype(jnp.float32)
    any_valid = jnp.sum(w) > 0

    y_max = jnp.max(jnp.where(weights, y, -jnp.inf))
    y_max = jnp.where(any_valid, y_max, 0.0)

    # weighted least squares for x = a y^2 + b y + c
    V = jnp.stack([y**2, y, jnp.ones_like(y)], axis=1)
    Vw = V * w[:, None]
    G = V.T @ Vw + 1e-6 * jnp.eye(3)
    rhs = Vw.T @ x
    coef = jnp.linalg.solve(G, rhs)

    y500 = jnp.linspace(0.0, y_max, 500)
    x500 = coef[0] * y500**2 + coef[1] * y500 + coef[2]
    start = jnp.argmin(x500**2 + y500**2)
    y_start = y500[start]

    y_new = jnp.linspace(y_start, y_max, n_out)
    x_new = coef[0] * y_new**2 + coef[1] * y_new + coef[2]
    fitted = jnp.stack([x_new, y_new], axis=1)

    stub = jnp.stack(
        [jnp.linspace(0.0, 0.1, n_out), jnp.linspace(0.0, 2.0, n_out)], axis=1
    )
    return jnp.where(any_valid, fitted, stub)


class TrackLimitExtractor:
    """Device-side mask -> {left, right, centre} BEV polylines. Construct
    once per (config, camera); call the jitted ``extract``."""

    def __init__(self, cfg: TrackExtractionConfig, camera: CameraInfo):
        self.cfg = cfg
        self.camera = camera
        self._h_i2w = jnp.asarray(camera.homography_i2w, jnp.float32)

    def extract(self, mask: jnp.ndarray) -> dict:
        """mask: (H, W) drivable 0/1. Returns dict of (n_polyfit_points, 2)
        BEV arrays plus raw masked boundary points for localisation."""
        cfg = self.cfg
        rows = jnp.arange(mask.shape[0])
        if cfg.connected_runs:
            mask = select_vehicle_connected_runs(
                mask,
                cfg.n_rows_to_remove_bonnet,
                band=cfg.connectivity_band,
            )
        left_cols, right_cols, row_valid = row_edge_columns(mask)

        left_valid = _edge_validity(left_cols, rows, row_valid, cfg)
        right_valid = _edge_validity(right_cols, rows, row_valid, cfg)

        left_pts = _image_to_ground(left_cols, rows, self._h_i2w)
        right_pts = _image_to_ground(right_cols, rows, self._h_i2w)

        left_valid = _bev_fov_mask(left_pts, left_valid)
        right_valid = _bev_fov_mask(right_pts, right_valid)

        left = masked_polyfit_track(left_pts, left_valid, cfg.n_polyfit_points)
        right = masked_polyfit_track(right_pts, right_valid, cfg.n_polyfit_points)

        # centre = midline with an origin stub prepended before the refit
        # (reference tracks.py:247-252)
        centre_raw = (left + right) / 2.0
        stub = jnp.concatenate(
            [
                jnp.full((N_ORIGIN_STUB, 1), centre_raw[0, 0]),
                jnp.zeros((N_ORIGIN_STUB, 1)),
            ],
            axis=1,
        )
        centre_pts = jnp.concatenate([stub, centre_raw], axis=0)
        centre_w = jnp.ones(centre_pts.shape[0], bool)
        centre = masked_polyfit_track(
            centre_pts, centre_w, cfg.n_polyfit_points
        )
        return {
            "left": left,
            "right": right,
            "centre": centre,
            "left_raw": left_pts,
            "left_raw_mask": left_valid,
            "right_raw": right_pts,
            "right_raw_mask": right_valid,
        }

    def jitted(self):
        return jax.jit(self.extract)


def maybe_interpolate_track_limit(
    left: np.ndarray, right: np.ndarray, track_width: float = 9.0
):
    """If one boundary has too few points, synthesise it from the other via
    unit normals x track width (reference
    utils/track_limit_interpolation.py:9-37). Host-side numpy helper used
    by the centreline-from-track-limits mode."""
    def synth(src, sign):
        d = np.gradient(src, axis=0)
        n = np.stack([-d[:, 1], d[:, 0]], axis=1)
        norm = np.linalg.norm(n, axis=1, keepdims=True)
        n = n / np.maximum(norm, 1e-9)
        return src + sign * track_width * n

    if len(left) < 5 and len(right) >= 5:
        left = synth(right, +1.0)
    elif len(right) < 5 and len(left) >= 5:
        right = synth(left, -1.0)
    return left, right
