"""Calibration parity battery — the reference's own test_calibration.py
(/root/reference/src/acmpc/perception/test_calibration.py:1-235) expected
values, element-wise against our CameraInfo, plus golden projected-point
regression fixtures.

The reference also ships EXPECTED_ROTATION_VALUES
(perception/expected_calibration_values.py) — golden pixels under
pitch/roll/yaw — but no reference test consumes them and their implied
fx/fy are mutually inconsistent with every (fov, size) combination of the
documented camera (legacy data from an older camera model), so the live
battery below is the authoritative calibration parity surface.
"""

import numpy as np
import pytest

from acmpc_tpu.perception.camera import CameraInfo


def make_camera(
    width=1080, height=540, fov=60.0, position=(0.0, 0.0, 1.0), pitch=0.0
):
    return CameraInfo(
        width=width,
        height=height,
        vertical_fov_deg=fov,
        position=list(position),
        pitch_deg=pitch,
    )


def test_focal_length_square_90fov():
    # ref test_calibration.py:22-30
    cam = make_camera(width=540, height=540, fov=90.0)
    assert np.isclose(cam.focal_length, cam.height / 2)


def test_camera_matrix():
    # ref test_calibration.py:32-44
    cam = make_camera(width=1080, height=540, fov=90.0)
    expected = np.array([[270, 0, 540], [0, 270, 270], [0, 0, 1]], float)
    np.testing.assert_allclose(cam.camera_matrix, expected, atol=1e-9)


@pytest.mark.parametrize(
    "pitch,expected",
    [
        (0.0, np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], float)),
        (
            10.0,
            np.array(
                [[1, 0, 0], [0, -0.173648, -0.984808], [0, 0.984808, -0.173648]]
            ),
        ),
        (
            -10.0,
            np.array(
                [[1, 0, 0], [0, 0.173648, -0.984808], [0, 0.984808, 0.173648]]
            ),
        ),
    ],
)
def test_rotation_matrices(pitch, expected):
    # ref test_calibration.py:46-82
    cam = make_camera(pitch=pitch)
    np.testing.assert_allclose(cam.rotation_matrix, expected, atol=1e-5)


def _world_to_camera(cam, wcf_points):
    """Reference translate_points_from_world_to_camera_frame
    (perception/utils.py:52-62): extrinsics applied to (N, 3) points."""
    homo = np.hstack([wcf_points, np.ones((len(wcf_points), 1))])
    return (cam.extrinsic_calibration @ homo.T).T


@pytest.mark.parametrize(
    "position,pitch,expected",
    [
        # ref test_calibration.py:84-104
        (
            (0.0, 0.0, 1.0),
            0.0,
            np.array([[50, 1, 400], [-50, 1, 400], [50, 1, 0], [0, 1, 0]], float),
        ),
        # ref test_calibration.py:106-121 (camera 2 m forward)
        (
            (0.0, 2.0, 1.0),
            0.0,
            np.array(
                [[50, 1, 398], [-50, 1, 398], [50, 1, -2], [0, 1, -2]], float
            ),
        ),
    ],
)
def test_extrinsics(position, pitch, expected):
    world = np.array([[50, 400, 0], [-50, 400, 0], [50, 0, 0], [0, 0, 0]], float)
    cam = make_camera(position=position, pitch=pitch)
    np.testing.assert_allclose(_world_to_camera(cam, world), expected, atol=1e-6)


def test_extrinsics_pitch45():
    # ref test_calibration.py:123-148
    world = np.array([[50, 400, 0], [-50, 400, 0], [50, 0, 0], [0, 0, 0]], float)
    cam = make_camera(position=(0.0, 0.0, 1.0), pitch=45.0)
    z_diff = np.sin(np.pi / 4) * 400
    y_diff = np.sin(np.pi / 4) * 1.0
    expected = np.array(
        [
            [50, -z_diff + y_diff, z_diff + y_diff],
            [-50, -z_diff + y_diff, z_diff + y_diff],
            [50, y_diff, y_diff],
            [0, y_diff, y_diff],
        ]
    )
    np.testing.assert_allclose(_world_to_camera(cam, world), expected, atol=1e-6)


def test_intrinsics():
    # ref test_calibration.py:150-176: camera-frame points onto the image
    cam = make_camera(width=1000, height=500, fov=90.0)
    camera_points = np.array([[0, 0, 20], [2, 0, 1], [0, 1, 1], [2, 1, 1]], float)
    pts = (cam.camera_matrix @ camera_points.T)
    image_points = (pts[:2] / pts[2]).T
    expected = np.array(
        [
            [cam.width / 2, cam.height / 2],
            [cam.width, cam.height / 2],
            [cam.width / 2, cam.height],
            [cam.width, cam.height],
        ]
    )
    np.testing.assert_allclose(image_points, expected, atol=1e-9)


def test_world_to_image_points():
    # ref test_calibration.py:178-199
    cam = make_camera(width=1000, height=500, fov=90.0)
    world = np.array([[0, 1, 1], [2, 1, 1], [0, 1, 0], [2, 1, 0]], float)
    expected = np.array(
        [
            [cam.width / 2, cam.height / 2],
            [cam.width, cam.height / 2],
            [cam.width / 2, cam.height],
            [cam.width, cam.height],
        ]
    )
    np.testing.assert_allclose(cam.world_to_image(world), expected, atol=1e-9)


def test_homography_matches_extrinsics_and_inverts():
    # ref test_calibration.py:201-231: projecting ground points through
    # the z=0 homography equals the full extrinsic projection, and the
    # inverse homography recovers the ground points
    cam = make_camera(width=1000, height=500, fov=90.0)
    ground = np.array([[-10, 400, 0], [10, 400, 0], [-10, 40, 0], [10, 40, 0]], float)
    via_homography = cam.ground_to_image(ground[:, :2])
    via_extrinsics = cam.world_to_image(ground)
    np.testing.assert_allclose(via_homography, via_extrinsics, atol=1e-9)
    back = cam.image_to_ground(via_homography)
    np.testing.assert_allclose(back, ground[:, :2], atol=1e-8)


# -- golden projected-point regression fixtures ---------------------------
# Four ground points seen by the documented reference camera config
# (test_calibration.py:12-20: 1080x540, fov 60, camera 1 m up) across the
# pitch range the configs use. Values generated once from this camera
# model and frozen: any drift in focal length, extrinsic composition, or
# homography layout fails these exactly.
_GOLDEN_POINTS = np.array([[-5.0, 10.0], [5.0, 10.0], [-5.0, 50.0], [5.0, 50.0]])
_GOLDEN_PIXELS = {
    0.0: np.array(
        [
            [306.17314098, 316.7653718],
            [773.82685902, 316.7653718],
            [493.2346282, 279.35307436],
            [586.7653718, 279.35307436],
        ]
    ),
    -10.0: np.array(
        [
            [298.30423635, 401.5448302],
            [781.69576365, 401.5448302],
            [492.3451402, 362.13797068],
            [587.6548598, 362.13797068],
        ]
    ),
    10.0: np.array(
        [
            [306.68004509, 234.92389014],
            [773.31995491, 234.92389014],
            [492.68007255, 197.1500146],
            [587.31992745, 197.1500146],
        ]
    ),
}


@pytest.mark.parametrize("pitch", sorted(_GOLDEN_PIXELS))
def test_golden_projections(pitch):
    cam = make_camera(pitch=pitch)
    got = cam.ground_to_image(_GOLDEN_POINTS)
    np.testing.assert_allclose(got, _GOLDEN_PIXELS[pitch], atol=1e-5)
