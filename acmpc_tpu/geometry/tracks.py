"""Synthetic track generators for tests and benchmarks.

Same track families as the reference's test fixtures
(/root/reference/src/acmpc/control/utils.py:11-32): hairpin, curve, chicane,
straight — each returns a ``(2, N)`` array of x/y points, optionally rotated.
Implemented in numpy (host-side fixture generation, not device work).
"""

from __future__ import annotations

import numpy as np


def rotate_track_points(x: np.ndarray, y: np.ndarray, angle: float) -> np.ndarray:
    rot = np.array(
        [[np.cos(angle), np.sin(angle)], [-np.sin(angle), np.cos(angle)]]
    )
    return rot @ np.stack([x, y])


def get_hairpin_track(radius: float, n_points: int, angle: float = 0.0) -> np.ndarray:
    theta = np.linspace(0.0, 1.5 * np.pi, n_points)
    return rotate_track_points(
        np.cos(theta) * radius - radius, np.sin(theta) * radius, angle
    )


def get_curved_track(coeff: float, n_points: int, angle: float = 0.0) -> np.ndarray:
    x = np.linspace(0.0, 100.0, n_points)
    return rotate_track_points(x, coeff * x**2, angle)


def get_chicane_track(
    distance_to_chicane: float,
    chicane_width: float,
    n_points: int,
    angle: float = 0.0,
) -> np.ndarray:
    y = np.linspace(0.0, 100.0, n_points)
    x = chicane_width / (1.0 + np.exp(-0.1 * (y - distance_to_chicane)))
    return rotate_track_points(x, y, angle)


def get_straight_track(length: float, n_points: int, angle: float = 0.0) -> np.ndarray:
    return rotate_track_points(
        np.zeros(n_points), np.linspace(0.0, length, n_points), angle
    )


def with_widths(track_xy: np.ndarray, width_near: float = 10.0, width_far: float = 6.0) -> np.ndarray:
    """Attach a linearly tapering width column, mirroring how the control
    process feeds the MPC (reference controller.py:256-267): returns (N, 3)
    ``[x, y, width]``."""
    n = track_xy.shape[1]
    widths = np.linspace(width_near, width_far, n)
    return np.stack([track_xy[0], track_xy[1], widths]).T


def offset_boundaries(centre: np.ndarray, half_width: float):
    """Left/right boundary polylines offset along a closed centreline's
    unit normals (left = +90 degrees from the direction of travel).
    Shared by the synthetic-circuit tools and test fixtures."""
    d = np.roll(centre, -1, axis=0) - centre
    t = d / np.linalg.norm(d, axis=1, keepdims=True)
    n = np.stack([-t[:, 1], t[:, 0]], axis=1)
    return centre + half_width * n, centre - half_width * n
