import numpy as np
import pytest
from scipy.signal import savgol_filter

from acmpc_tpu.localise.track_map import load_track_map
from acmpc_tpu.mapping.map_maker import (
    MapMaker,
    savgol_wrap,
    upsample_track,
)
from acmpc_tpu.native import tsp_tour


def test_savgol_matches_scipy():
    rng = np.random.default_rng(0)
    x = np.cumsum(rng.normal(size=200))
    ours = savgol_wrap(x, 15, 1)
    scipys = savgol_filter(x, window_length=15, polyorder=1, mode="wrap")
    np.testing.assert_allclose(ours, scipys, rtol=1e-10, atol=1e-10)


def test_upsample_density():
    track = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
    up = upsample_track(track, desired_density=0.5)
    d = np.linalg.norm(np.diff(up, axis=0), axis=1)
    assert d.max() < 1.0
    assert len(up) > 50


def test_tsp_tour_orders_shuffled_loop():
    rng = np.random.default_rng(1)
    theta = np.linspace(0, 2 * np.pi, 200, endpoint=False)
    loop = np.stack([100 * np.cos(theta), 80 * np.sin(theta)], axis=1)
    loop += rng.normal(scale=0.3, size=loop.shape)
    perm = rng.permutation(200)
    order = tsp_tour(loop[perm], time_bound_s=3.0)
    ordered = loop[perm][order]
    # tour length close to the loop circumference
    tour_len = np.linalg.norm(np.diff(np.vstack([ordered, ordered[:1]]), axis=0), axis=1).sum()
    circumference = np.linalg.norm(np.diff(np.vstack([loop, loop[:1]]), axis=0), axis=1).sum()
    assert tour_len < 1.25 * circumference, (tour_len, circumference)


def simulate_mapping_lap(n_frames=400):
    """Drive a lap accumulating BEV boundary observations per frame."""
    mm = MapMaker()
    theta = np.linspace(0, 2 * np.pi, n_frames, endpoint=False)
    r = 150.0 + 20.0 * np.sin(2 * theta)
    centre = np.stack([r * np.cos(theta), r * np.sin(theta)], axis=1)
    d = np.roll(centre, -1, axis=0) - centre
    t = d / np.linalg.norm(d, axis=1, keepdims=True)
    normal = np.stack([-t[:, 1], t[:, 0]], axis=1)
    left = centre + 5.0 * normal
    right = centre - 5.0 * normal
    for i in range(n_frames):
        yaw = np.arctan2(t[i, 1], t[i, 0])
        pose = {"x": -centre[i, 0], "z": centre[i, 1], "translation_yaw": yaw}
        rot = np.array([[np.cos(yaw), -np.sin(yaw)], [np.sin(yaw), np.cos(yaw)]])
        # BEV frame observation (inverse of the accumulation transform)
        bev_left = (rot @ (left[i] - centre[i]).reshape(1, 2).T).T
        bev_right = (rot @ (right[i] - centre[i]).reshape(1, 2).T).T
        bev_centre = np.zeros((1, 2))
        mm.process_segmentation_tracks(pose, bev_left, bev_right, bev_centre)
    return mm, centre


def test_save_map_roundtrip(tmp_path):
    mm, true_centre = simulate_mapping_lap()
    out = str(tmp_path / "test_map.npy")
    built = mm.save_map(out)
    assert mm.map_built
    for key in ("outside_track", "inside_track", "centre_track"):
        assert len(built[key]) > 100

    # loads through the TrackMap reader (reference-compatible keys)
    tm = load_track_map(out)
    centre = np.asarray(tm.centre)
    # dense map: ~0.5 m spacing
    spacing = np.linalg.norm(np.diff(centre, axis=0), axis=1)
    assert np.median(spacing) < 1.0
    # built centreline stays within the true corridor
    d2 = (
        np.sum(centre**2, 1)[:, None]
        - 2 * centre @ true_centre.T
        + np.sum(true_centre**2, 1)[None, :]
    )
    dist_to_true = np.sqrt(np.maximum(d2.min(axis=1), 0))
    assert np.percentile(dist_to_true, 95) < 6.0
