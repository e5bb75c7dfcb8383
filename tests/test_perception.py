import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acmpc_tpu.config.schema import PerceptionConfig
from acmpc_tpu.perception.camera import CameraInfo
from acmpc_tpu.perception.tracks import (
    TrackExtractionConfig,
    TrackLimitExtractor,
    masked_polyfit_track,
    row_edge_columns,
)

PCFG = PerceptionConfig(
    model_path="/nonexistent.msgpack",
    precision="fp32",
    image_width=320,
    image_height=192,
    n_polyfit_points=100,
    n_rows_to_remove_bonnet=160,
    centerline_from_track_limits=False,
    vertical_fov_deg=60,
    camera_position=(0.0, 1.45, 0.56),
    camera_pitch_deg=2.889419,
)


def make_camera(width=1280, height=736):
    return CameraInfo(
        width=width,
        height=height,
        vertical_fov_deg=60,
        position=[0.0, 1.45, 0.56],
        pitch_deg=2.889419,
    )


def test_focal_length_closed_form():
    cam = make_camera()
    expected = 736 / (2 * math.tan(math.radians(60) / 2))
    assert abs(cam.focal_length - expected) < 1e-9
    assert cam.camera_matrix[0, 2] == 1280 / 2
    assert cam.camera_matrix[1, 2] == 736 / 2


def test_homography_roundtrip():
    cam = make_camera()
    ground = np.array([[1.0, 10.0], [-3.0, 25.0], [0.5, 60.0]])
    image = cam.ground_to_image(ground)
    back = cam.image_to_ground(image)
    np.testing.assert_allclose(back, ground, rtol=1e-6, atol=1e-6)


def test_points_ahead_project_into_image():
    cam = make_camera()
    # a ground point straight ahead should project near the image centre x
    img = cam.ground_to_image(np.array([[0.0, 30.0]]))
    assert abs(img[0, 0] - 640) < 1.0
    assert 0 < img[0, 1] < 736


def test_row_edge_columns():
    mask = jnp.zeros((6, 10), jnp.uint8)
    mask = mask.at[2, 3:7].set(1)
    mask = mask.at[3, 1:9].set(1)
    left, right, valid = row_edge_columns(mask)
    assert int(left[2]) == 3 and int(right[2]) == 6
    assert int(left[3]) == 1 and int(right[3]) == 8
    assert not bool(valid[0]) and bool(valid[2])


def test_polyfit_recovers_parabola():
    y = jnp.linspace(1.0, 50.0, 80)
    x = 0.01 * y**2 - 0.2 * y + 1.0
    pts = jnp.stack([x, y], axis=1)
    w = jnp.ones(80, bool)
    out = masked_polyfit_track(pts, w, 50)
    y_out = out[:, 1]
    expected_x = 0.01 * y_out**2 - 0.2 * y_out + 1.0
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(expected_x), atol=1e-3)


def test_polyfit_empty_returns_stub():
    pts = jnp.zeros((10, 2))
    out = masked_polyfit_track(pts, jnp.zeros(10, bool), 25)
    assert out.shape == (25, 2)
    np.testing.assert_allclose(np.asarray(out[-1]), [0.1, 2.0], atol=1e-6)


def synthetic_road_mask(cam, cfg, half_width=5.0, length=80.0):
    """Render a straight road of the given half-width into the image mask
    via the camera's ground->image projection."""
    h, w = cfg.image_height, cfg.image_width
    ys, xs = np.mgrid[0:h, 0:w]
    pix = np.stack([xs.ravel(), ys.ravel()], axis=1).astype(np.float64)
    ground = cam.image_to_ground(pix)
    gx, gy = ground[:, 0].reshape(h, w), ground[:, 1].reshape(h, w)
    mask = (np.abs(gx) < half_width) & (gy > 1.0) & (gy < length)
    return mask.astype(np.uint8)


def test_extractor_straight_road():
    cam = CameraInfo.from_config(PCFG)
    cfg = TrackExtractionConfig.from_config(PCFG)
    ext = TrackLimitExtractor(cfg, cam)
    mask = synthetic_road_mask(cam, PCFG)
    out = jax.jit(ext.extract)(jnp.asarray(mask))
    left = np.asarray(out["left"])
    right = np.asarray(out["right"])
    centre = np.asarray(out["centre"])
    # straight road: boundaries near +/- 5 m, centre near 0
    assert abs(np.median(left[:, 0]) + 5.0) < 1.0, np.median(left[:, 0])
    assert abs(np.median(right[:, 0]) - 5.0) < 1.0
    assert abs(np.median(centre[:, 0])) < 0.7
    # centreline extends forward
    assert centre[-1, 1] > 20.0


def test_extractor_empty_mask_is_stable():
    cam = CameraInfo.from_config(PCFG)
    cfg = TrackExtractionConfig.from_config(PCFG)
    ext = TrackLimitExtractor(cfg, cam)
    out = jax.jit(ext.extract)(jnp.zeros((PCFG.image_height, PCFG.image_width), jnp.uint8))
    assert np.isfinite(np.asarray(out["centre"])).all()


def test_fpn_model_shapes():
    from acmpc_tpu.models import FPNResNet18

    model = FPNResNet18(num_classes=10)
    x = jnp.zeros((1, 64, 96, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    logits = model.apply(variables, x)
    assert logits.shape == (1, 64, 96, 10)


def test_segmenter_on_random_weights():
    from acmpc_tpu.perception.segmentation import TrackSegmenter

    seg = TrackSegmenter(PCFG)  # nonexistent path -> random init
    img = np.random.randint(0, 255, (PCFG.image_height, PCFG.image_width, 3), np.uint8)
    drivable, semantics = seg.segment_drivable_area(img)
    assert drivable.shape == (PCFG.image_height, PCFG.image_width)
    assert int(jnp.max(drivable)) <= 1  # classes > 1 zeroed


def test_perceiver_end_to_end():
    from acmpc_tpu.perception.perceiver import Perceiver

    perceiver = Perceiver(PCFG)  # random weights
    img = np.random.randint(0, 255, (240, 400, 3), np.uint8)  # wrong size
    out = perceiver.perceive(img)  # resize guard kicks in
    assert out["drivable"].shape == (PCFG.image_height, PCFG.image_width)
    assert out["centreline"].shape == (PCFG.n_polyfit_points, 2)
    assert np.isfinite(np.asarray(out["centreline"])).all()
