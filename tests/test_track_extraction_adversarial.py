"""Adversarial-mask tests for track-limit extraction (VERDICT r1 item 6).

The per-row edge reduction (reference tracks.py:180-194 fallback) breaks
on frames where a raster row crosses the track twice; the reference's
primary contour path (tracks.py:38-178) exists for exactly these cases.
These tests cover them against the TPU-native counterpart,
``select_vehicle_connected_runs``: hairpin filling the view, disconnected
noise blobs, occlusion gaps, and the no-regression straight/empty cases.

All masks are built directly in image space: H=64 rows, W=96 columns,
bonnet at row 56, vehicle looking up the image (row 0 = far away).
"""

import numpy as np
import jax.numpy as jnp

from acmpc_tpu.perception.tracks import (
    row_edge_columns,
    select_vehicle_connected_runs,
)

H, W = 64, 96
BONNET = 56


def _fill(mask, r, lo, hi):
    mask[r, max(0, lo) : min(W, hi)] = 1


def straight_mask():
    m = np.zeros((H, W), np.uint8)
    for r in range(8, BONNET):
        _fill(m, r, 36, 60)
    return m


def hairpin_mask():
    """Near leg up the centre, apex at the top, far leg coming back down
    on the right — rows below the apex cross the track TWICE."""
    m = np.zeros((H, W), np.uint8)
    for r in range(20, BONNET):  # near leg (vehicle-connected)
        _fill(m, r, 30, 50)
    for r in range(12, 20):  # apex joins the legs
        _fill(m, r, 30, 86)
    for r in range(20, 48):  # far leg, same rows as the near leg
        _fill(m, r, 66, 86)
    return m


def noise_blob_mask():
    m = straight_mask()
    for r in range(30, 40):  # disconnected blob (e.g. another track piece)
        _fill(m, r, 4, 14)
    return m


def gap_mask():
    m = straight_mask()
    m[30:32, :] = 0  # 2-row occlusion, below the tolerance
    return m


def long_gap_mask():
    m = straight_mask()
    m[28:36, :] = 0  # 8-row break: chain must die above it
    return m


def test_straight_mask_unchanged():
    m = straight_mask()
    sel = np.asarray(select_vehicle_connected_runs(jnp.asarray(m), BONNET))
    np.testing.assert_array_equal(sel, m)


def test_hairpin_far_leg_rejected():
    m = hairpin_mask()
    sel = np.asarray(select_vehicle_connected_runs(jnp.asarray(m), BONNET))

    # the raw per-row edges straddle both legs below the apex...
    _, right_raw, _ = row_edge_columns(jnp.asarray(m))
    assert int(right_raw[40]) == 85, "fixture: raw right edge hits far leg"

    # ...but the selected mask keeps only the vehicle-connected near leg
    # below the apex, so its right edge is the near leg's
    _, right_sel, valid = row_edge_columns(jnp.asarray(sel))
    for r in range(24, BONNET):
        assert bool(valid[r])
        assert int(right_sel[r]) == 49, f"row {r}: {int(right_sel[r])}"
    # the apex rows themselves (legs joined) may include both — that IS
    # one connected run there
    assert sel[15, 80] == 1  # apex row spans to the right
    # far-leg rows BELOW the apex are gone
    assert sel[40, 66:86].sum() == 0


def test_hairpin_boundary_error_vs_plain():
    """Quantified: max right-boundary column error against ground truth
    (near-leg edge at col 49) below the apex."""
    m = hairpin_mask()
    _, right_raw, _ = row_edge_columns(jnp.asarray(m))
    sel = select_vehicle_connected_runs(jnp.asarray(m), BONNET)
    _, right_sel, _ = row_edge_columns(sel)
    rows = np.arange(24, 48)
    err_raw = np.abs(np.asarray(right_raw)[rows] - 49).max()
    err_sel = np.abs(np.asarray(right_sel)[rows] - 49).max()
    assert err_raw >= 36, "fixture should break the plain path"
    assert err_sel == 0, f"connected-run extraction off by {err_sel} cols"


def test_noise_blob_ignored():
    m = noise_blob_mask()
    sel = np.asarray(select_vehicle_connected_runs(jnp.asarray(m), BONNET))
    assert sel[30:40, 4:14].sum() == 0, "disconnected blob leaked through"
    np.testing.assert_array_equal(sel[:, 36:60], m[:, 36:60])


def test_short_occlusion_gap_bridged():
    m = gap_mask()
    sel = np.asarray(select_vehicle_connected_runs(jnp.asarray(m), BONNET))
    # track above the 2-row gap survives
    assert sel[8:30].sum() > 0
    np.testing.assert_array_equal(sel, m)


def test_long_break_truncates_chain():
    m = long_gap_mask()
    sel = np.asarray(select_vehicle_connected_runs(jnp.asarray(m), BONNET))
    assert sel[36:BONNET].sum() > 0  # below the break: kept
    assert sel[:28].sum() == 0  # above an 8-row break: truncated


def test_empty_mask_falls_back():
    m = np.zeros((H, W), np.uint8)
    sel = np.asarray(select_vehicle_connected_runs(jnp.asarray(m), BONNET))
    assert sel.sum() == 0


def test_offcentre_seed_falls_back_to_input():
    """Track entirely outside the central third: the seed finds nothing,
    the input mask passes through (reference naive-fallback semantics)."""
    m = np.zeros((H, W), np.uint8)
    for r in range(8, BONNET):
        _fill(m, r, 2, 20)
    sel = np.asarray(select_vehicle_connected_runs(jnp.asarray(m), BONNET))
    np.testing.assert_array_equal(sel, m)


def test_extractor_integration_hairpin():
    """Through the full TrackLimitExtractor: the hairpin's far leg must
    not drag the fitted right boundary toward +x."""
    from acmpc_tpu.perception.camera import CameraInfo
    from acmpc_tpu.perception.tracks import (
        TrackExtractionConfig,
        TrackLimitExtractor,
    )

    camera = CameraInfo(
        width=W,
        height=H,
        vertical_fov_deg=60.0,
        position=(0.0, 0.0, 1.2),
        pitch_deg=-12.0,
    )
    m = jnp.asarray(hairpin_mask())
    base = TrackExtractionConfig(
        image_width=W,
        image_height=H,
        n_polyfit_points=50,
        n_rows_to_remove_bonnet=BONNET,
    )
    with_sel = TrackLimitExtractor(base, camera).jitted()(m)
    import dataclasses

    plain_cfg = dataclasses.replace(base, connected_runs=False)
    plain = TrackLimitExtractor(plain_cfg, camera).jitted()(m)

    # the plain path's right boundary is dragged right by the far leg
    assert float(np.max(plain["right"][:, 0])) > float(
        np.max(with_sel["right"][:, 0])
    )
