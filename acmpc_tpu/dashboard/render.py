"""Dashboard panel rendering.

Counterpart of the reference's feed threads + BEV/map plot helpers
(/root/reference/src/acmpc/dashboard/backend/feeds.py:23-242,
dashboard/visualisation/plots.py:25-62, visualisation/utils.py:7-71) —
rendered with OpenCV into a composite frame instead of QML widgets, so it
works headless and streams over HTTP.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

# 10-class semantic palette (role-equivalent of the reference's
# visualisation/utils.py palette)
SEMANTIC_PALETTE = np.array(
    [
        [0, 0, 0],        # 0 background
        [128, 128, 128],  # 1 drivable
        [50, 160, 50],    # 2 grass
        [180, 130, 70],   # 3 kerb
        [0, 0, 200],      # 4 wall
        [200, 200, 0],    # 5 sand
        [200, 0, 200],    # 6 car
        [0, 200, 200],    # 7 marking
        [100, 50, 150],   # 8 bridge
        [255, 255, 255],  # 9 other
    ],
    dtype=np.uint8,
)


def render_semantics(semantics: np.ndarray) -> np.ndarray:
    return SEMANTIC_PALETTE[np.clip(semantics, 0, 9)]


def render_bev(
    tracks: Optional[Dict],
    prediction: Optional[np.ndarray],
    size: int = 400,
    scale: float = 2.0,
) -> np.ndarray:
    """BEV panel: track polylines + MPC prediction (reference
    plots.py:41-62). Ego at bottom-centre, y up."""
    import cv2

    img = np.zeros((size, size, 3), np.uint8)

    def to_px(points):
        px = (size // 2 + points[:, 0] * scale).astype(np.int32)
        py = (size - 20 - points[:, 1] * scale).astype(np.int32)
        return np.stack([px, py], axis=1)

    def draw(points, colour):
        if points is None or len(points) == 0:
            return
        points = np.asarray(points)
        points = points[np.isfinite(points).all(axis=1)]
        if len(points) == 0:
            return
        pts = to_px(points)
        ok = (
            (pts[:, 0] >= 0)
            & (pts[:, 0] < size)
            & (pts[:, 1] >= 0)
            & (pts[:, 1] < size)
        )
        for x, y in pts[ok]:
            cv2.circle(img, (int(x), int(y)), 1, colour, -1)

    if tracks is not None:
        draw(tracks.get("left"), (255, 160, 60))
        draw(tracks.get("right"), (60, 160, 255))
        draw(tracks.get("centre"), (120, 255, 120))
    draw(prediction, (0, 0, 255))
    cv2.drawMarker(
        img, (size // 2, size - 20), (255, 255, 255), cv2.MARKER_TRIANGLE_UP, 10
    )
    return img


def render_world_map(
    map_polylines: Optional[Dict],
    particles: Optional[np.ndarray],
    estimate: Optional[np.ndarray],
    car_pose: Optional[np.ndarray],
    size: int = 400,
) -> np.ndarray:
    """World panel: track map + particle cloud + estimate (reference
    plots.py:25-38, MapFeed feeds.py:139-157)."""
    import cv2

    img = np.zeros((size, size, 3), np.uint8)
    if map_polylines is None:
        return img
    centre = np.asarray(map_polylines["centre"])
    lo = centre.min(axis=0)
    hi = centre.max(axis=0)
    span = max(float((hi - lo).max()), 1e-6)
    pad = 20

    def to_px(points):
        p = (np.asarray(points) - lo) / span
        px = (pad + p[:, 0] * (size - 2 * pad)).astype(np.int32)
        py = (size - pad - p[:, 1] * (size - 2 * pad)).astype(np.int32)
        return np.stack([px, py], axis=1)

    for key, colour in [("left", (90, 90, 90)), ("right", (90, 90, 90)), ("centre", (50, 120, 50))]:
        if key in map_polylines:
            for x, y in to_px(map_polylines[key])[::4]:
                if 0 <= x < size and 0 <= y < size:
                    img[y, x] = colour
    if particles is not None and len(particles):
        for x, y in to_px(particles[:, :2]):
            if 0 <= x < size and 0 <= y < size:
                cv2.circle(img, (int(x), int(y)), 1, (0, 200, 200), -1)
    if estimate is not None:
        x, y = to_px(estimate[None, :2])[0]
        cv2.drawMarker(img, (int(x), int(y)), (0, 0, 255), cv2.MARKER_CROSS, 12, 2)
    if car_pose is not None:
        x, y = to_px(car_pose[None, :2])[0]
        cv2.circle(img, (int(x), int(y)), 4, (255, 255, 255), -1)
    return img


def render_local_localisation(
    map_polylines: Optional[Dict],
    particles: Optional[np.ndarray],
    estimate: Optional[np.ndarray],
    car_pose: Optional[np.ndarray],
    window_m: float = 80.0,
    size: int = 400,
) -> np.ndarray:
    """Local localisation panel (reference LocalisationFeed,
    feeds.py:117-137): the particle cloud + estimate over the map,
    zoomed to a window around the best estimate (or the car)."""
    import cv2

    img = np.zeros((size, size, 3), np.uint8)
    anchor = None
    if estimate is not None:
        anchor = np.asarray(estimate[:2], float)
    elif car_pose is not None:
        anchor = np.asarray(car_pose[:2], float)
    elif particles is not None and len(particles):
        anchor = np.asarray(particles[:, :2], float).mean(axis=0)
    if anchor is None or map_polylines is None:
        return img

    scale = size / (2.0 * window_m)

    def to_px(points):
        p = (np.asarray(points)[:, :2] - anchor) * scale
        px = (size // 2 + p[:, 0]).astype(np.int32)
        py = (size // 2 - p[:, 1]).astype(np.int32)
        return np.stack([px, py], axis=1)

    def in_view(pts):
        return pts[
            (pts[:, 0] >= 0)
            & (pts[:, 0] < size)
            & (pts[:, 1] >= 0)
            & (pts[:, 1] < size)
        ]

    for key, colour in [
        ("left", (130, 130, 130)),
        ("right", (130, 130, 130)),
        ("centre", (60, 160, 60)),
    ]:
        if key in map_polylines:
            for x, y in in_view(to_px(map_polylines[key])):
                img[y, x] = colour
    if particles is not None and len(particles):
        for x, y in in_view(to_px(particles)):
            cv2.circle(img, (int(x), int(y)), 1, (0, 200, 200), -1)
    if estimate is not None:
        cv2.drawMarker(
            img, (size // 2, size // 2), (0, 0, 255), cv2.MARKER_CROSS, 14, 2
        )
    if car_pose is not None:
        x, y = to_px(np.asarray(car_pose)[None, :2])[0]
        if 0 <= x < size and 0 <= y < size:
            cv2.circle(img, (int(x), int(y)), 4, (255, 255, 255), -1)
    return img


def compose_dashboard(panels: Dict[str, np.ndarray], width: int = 1280) -> np.ndarray:
    """Tile named panels into one frame with labels."""
    import cv2

    tiles = []
    for name, panel in panels.items():
        if panel is None:
            continue
        p = panel
        if p.ndim == 2:
            p = np.repeat(p[..., None], 3, axis=2)
        if p.dtype != np.uint8:
            p = np.clip(p, 0, 255).astype(np.uint8)
        h = 360
        w = int(p.shape[1] * h / p.shape[0])
        p = cv2.resize(p, (w, h))
        cv2.putText(
            p, name, (8, 24), cv2.FONT_HERSHEY_SIMPLEX, 0.7, (255, 255, 255), 2
        )
        tiles.append(p)
    if not tiles:
        return np.zeros((360, width, 3), np.uint8)
    rows = []
    row: list = []
    used = 0
    for t in tiles:
        if used + t.shape[1] > width and row:
            rows.append(row)
            row, used = [], 0
        row.append(t)
        used += t.shape[1]
    rows.append(row)
    out_rows = []
    for row in rows:
        h = max(t.shape[0] for t in row)
        padded = [
            np.pad(t, ((0, h - t.shape[0]), (0, 0), (0, 0))) for t in row
        ]
        strip = np.concatenate(padded, axis=1)
        if strip.shape[1] < width:
            strip = np.pad(strip, ((0, 0), (0, width - strip.shape[1]), (0, 0)))
        out_rows.append(strip[:, :width])
    return np.concatenate(out_rows, axis=0)
