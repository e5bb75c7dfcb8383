"""Shipped-asset battery (counterpart of the reference's downloaded
assets, scripts/download_assets.sh: 7 maps + segmentation models +
racelines). Here every asset is BUILT by the framework's own tools
(tools/build_assets.py, tools/train_segmenter.py) and these tests keep
them loadable and sane."""

import pathlib

import numpy as np
import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent
TRACKS = [
    "monza", "spa", "silverstone", "nordschleife",
    "vallelunga", "bathurst", "yas_marina",
]


@pytest.mark.parametrize("track", TRACKS)
def test_shipped_map_loads_and_is_clean(track):
    from acmpc_tpu.localise.track_map import load_track_map

    tm = load_track_map(ROOT / "data" / "maps" / f"{track}.npz")
    c = np.asarray(tm.centre)
    assert len(c) > 2000
    ds = np.linalg.norm(np.diff(c, axis=0), axis=1)
    # uniform spacing and bounded curvature by construction
    assert ds.max() < 1.0 and ds.min() > 0.2
    d1 = np.diff(c, axis=0)
    psi = np.arctan2(d1[:, 1], d1[:, 0])
    dpsi = np.abs(np.mod(np.diff(psi) + np.pi, 2 * np.pi) - np.pi)
    kappa = dpsi / (ds[1:] + 1e-9)
    assert kappa.max() < 0.05, f"curvature spike {kappa.max():.3f}"


@pytest.mark.parametrize("track", TRACKS)
def test_shipped_raceline_inside_track(track):
    from acmpc_tpu.localise.track_map import load_track_map

    data = np.load(ROOT / "data" / "racelines" / f"{track}.npz")
    line = data["raceline"]
    speeds = data["speeds"]
    half_width = float(data["half_width"])
    assert len(line) == len(speeds) + 1 or len(line) == len(speeds)
    tm = load_track_map(ROOT / "data" / "maps" / f"{track}.npz")
    centre = np.asarray(tm.centre)
    d = np.sqrt(
        ((line[:, None, :] - centre[None, ::5, :]) ** 2).sum(-1)
    ).min(axis=1)
    assert d.max() <= half_width, f"raceline leaves the corridor: {d.max():.2f}"
    assert speeds.min() > 1.0 and np.isfinite(speeds).all()


def test_shipped_segmentation_checkpoint():
    """The trained checkpoint loads through the production loader
    (fp16 storage -> compute dtype) and segments a fresh synthetic-sim
    frame at high IoU."""
    import dataclasses

    import jax.numpy as jnp

    from acmpc_tpu.config import load_config
    from acmpc_tpu.localise.track_map import TrackMap
    from acmpc_tpu.perception.camera import CameraInfo
    from acmpc_tpu.perception.segmentation import TrackSegmenter
    from acmpc_tpu.runtime.sim import SyntheticSimulator

    cfg = load_config(ROOT / "configs" / "monza.yaml").perception
    cfg = dataclasses.replace(
        cfg, image_width=320, image_height=192, n_rows_to_remove_bonnet=160
    )
    seg = TrackSegmenter(cfg)  # loads cfg.model_path (the shipped asset)

    theta = np.linspace(0, 2 * np.pi, 800, endpoint=False)
    r = 160.0 + 25.0 * np.sin(2 * theta)
    centre = np.stack([r * np.cos(theta), r * np.sin(theta)], axis=1)
    d = np.roll(centre, -1, axis=0) - centre
    t = d / np.linalg.norm(d, axis=1, keepdims=True)
    n = np.stack([-t[:, 1], t[:, 0]], axis=1)
    tm = TrackMap(
        centre=jnp.asarray(centre, jnp.float32),
        left=jnp.asarray(centre + 5 * n, jnp.float32),
        right=jnp.asarray(centre - 5 * n, jnp.float32),
    )
    cam = CameraInfo(
        width=320, height=192, vertical_fov_deg=60.0,
        position=[0.0, 0.0, 1.2], pitch_deg=9.0,
    )
    sim = SyntheticSimulator(tm, cam, half_width=5.0, start_index=123)
    mask = sim.render_drivable_mask()
    image = sim.render_camera_image(mask)
    drivable, _ = seg.segment_drivable_area(image)
    pred = np.asarray(drivable) == 1
    gt = mask.astype(bool)
    iou = (pred & gt).sum() / max((pred | gt).sum(), 1)
    assert iou > 0.85, f"shipped model IoU {iou:.3f}"


@pytest.mark.parametrize("track", TRACKS + ["synth_nordschleife"])
def test_shipped_raceline_is_not_more_curved_than_centreline(track):
    """The minimum-curvature raceline must not read as MORE curved than
    the centreline it optimises: build_assets once interpolated the
    ~11 m-spaced optimised polygon linearly to 2 m, leaving a chord kink
    at every coarse vertex whose discretised curvature (turn angle /
    fine segment) dwarfed the track's true curvature — the speed profile
    braked for phantom corners and the 'raceline' lapped SLOWER than the
    centreline. The fix transfers the smooth lateral offset onto the
    dense map geometry instead (build_assets.py::build_raceline)."""
    from acmpc_tpu.localise.track_map import load_track_map

    line = np.load(ROOT / "data" / "racelines" / f"{track}.npz")["raceline"]
    map_path = ROOT / "data" / "maps" / f"{track}.npz"
    if not map_path.exists():
        map_path = ROOT / "data" / "maps" / f"{track}.npy"
    centre = np.asarray(load_track_map(map_path).centre)

    def curvature(pts):
        d1 = np.gradient(pts, axis=0)
        d2 = np.gradient(d1, axis=0)
        num = np.abs(d1[:, 0] * d2[:, 1] - d1[:, 1] * d2[:, 0])
        den = (d1[:, 0] ** 2 + d1[:, 1] ** 2) ** 1.5
        return num / np.maximum(den, 1e-9)

    k_line = curvature(line)
    k_centre = curvature(centre)
    p95_line = np.percentile(k_line, 95)
    p95_centre = np.percentile(k_centre, 95)
    assert p95_line <= 1.1 * p95_centre, (
        f"raceline k_p95 {p95_line:.4f} vs centre {p95_centre:.4f}"
    )
    # no chord-kink spikes: worst raceline curvature stays within the
    # corridor-geometry bound of the worst centre curvature
    assert k_line.max() <= 2.0 * max(k_centre.max(), 1e-3), (
        f"raceline curvature spike {k_line.max():.4f} "
        f"(centre max {k_centre.max():.4f})"
    )
