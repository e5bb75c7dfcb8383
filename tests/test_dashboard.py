"""Dashboard surface: per-feed MJPEG endpoints, feed-grid page, session
JSON with lap + sector bookkeeping (counterpart of the reference's QML
feed grid + SessionSummary, ui/FeedGrid.qml / ui/SessionSummary.qml /
backend/session_information.py)."""

import dataclasses
import json
import urllib.request

import numpy as np
import pytest

from acmpc_tpu.dashboard.session import SessionTracker


def test_session_tracker_sectors():
    """3-sector accumulation, per-sector bests and colouring mirror the
    reference provider (session_information.py:70-89, 300-450)."""
    st = SessionTracker()
    # lap 1: sectors of 10 s / 12 s / 8 s
    for t, sector in [(4000, 0), (10000, 0), (15000, 1), (22000, 1),
                      (25000, 2), (30000, 2)]:
        st.update({"i_current_time": t, "current_sector_index": sector,
                   "completed_laps": 0})
    st.update({"i_current_time": 100, "current_sector_index": 0,
               "completed_laps": 1, "i_last_time": 30000})
    snap = st.snapshot()
    assert snap["completed_laps"] == 1
    assert snap["last"]["time"] == "00:30.000"
    assert snap["last"]["colour"] == "purple"  # first lap = session best
    sectors = snap["last"]["sectors"]
    assert len(sectors) == 3
    assert sectors[0]["time"] == "00:10.000"
    assert sectors[1]["time"] == "00:12.000"
    assert sectors[2]["time"] == "00:08.000"
    assert all(s["colour"] == "purple" for s in sectors)

    # lap 2: slower overall, faster sector 2
    for t, sector in [(11000, 0), (15000, 1), (21000, 1), (26000, 2),
                      (32000, 2)]:
        st.update({"i_current_time": t, "current_sector_index": sector,
                   "completed_laps": 1})
    st.update({"i_current_time": 50, "current_sector_index": 0,
               "completed_laps": 2, "i_last_time": 32000})
    snap = st.snapshot()
    last = snap["last"]
    assert last["colour"] == "yellow"
    assert last["delta"] == "+00:02.000"
    assert last["sectors"][1]["colour"] == "purple"  # 10s < 12s best
    assert last["sectors"][0]["colour"] == "yellow"  # 11s > 10s best
    assert snap["best_lap"] == "00:30.000"
    # best sectors are the composites: 10 / 10 / 8
    assert snap["best_sectors"] == ["00:10.000", "00:10.000", "00:08.000"]


@pytest.fixture(scope="module")
def live_dashboard(tmp_path_factory):
    """A dashboard serving a real agent on the synthetic sim."""
    from acmpc_tpu.config import load_config
    from acmpc_tpu.dashboard.server import Dashboard
    from acmpc_tpu.localise.track_map import save_track_map
    from acmpc_tpu.perception.camera import CameraInfo
    from acmpc_tpu.runtime import Agent, SyntheticSimulator
    from test_localise import make_asymmetric_map

    cfg = load_config("configs/monza.yaml")
    cfg = dataclasses.replace(
        cfg,
        perception=dataclasses.replace(
            cfg.perception,
            image_width=320,
            image_height=192,
            n_rows_to_remove_bonnet=160,
            n_polyfit_points=200,
        ),
        racing_control=dataclasses.replace(
            cfg.racing_control, horizon=20
        ),
        localisation=dataclasses.replace(
            cfg.localisation, use_localisation=False
        ),
        create_map=False,
    )
    tm = make_asymmetric_map()
    map_path = str(tmp_path_factory.mktemp("dash") / "track.npz")
    save_track_map(map_path, tm.centre, tm.left, tm.right)
    sim = SyntheticSimulator(
        tm, CameraInfo.from_config(cfg.perception), half_width=5.0
    )
    agent = Agent(cfg, sim, use_oracle_perception=True, map_path=map_path)
    dash = Dashboard(agent, sim, port=18793, fps=20.0)
    dash.start()
    try:
        obs = sim.reset()
        agent.controller.wait_for_first_command(timeout=180)
        for _ in range(10):
            obs = sim.step(agent.behaviour(obs))
        yield dash
    finally:
        dash.stop()
        agent.teardown()


def _get(path: str, n_bytes: int | None = None):
    with urllib.request.urlopen(
        f"http://127.0.0.1:18793{path}", timeout=20
    ) as r:
        return r.read(n_bytes) if n_bytes else r.read()


def test_dashboard_serves_grid_page_and_session(live_dashboard):
    page = _get("/").decode()
    for feed in ("camera", "segmentation", "control", "semantics",
                 "localisation", "map"):
        assert feed in page
    assert "Session" in page or "session" in page
    snap = json.loads(_get("/session.json"))
    assert "current" in snap and "best_sectors" in snap
    assert len(snap["best_sectors"]) == 3


@pytest.mark.parametrize("feed", ["control", "map", "segmentation"])
def test_dashboard_streams_per_feed_mjpeg(live_dashboard, feed):
    # rendering is lazy (server-side feed lifecycle): the first frame is
    # produced only once a stream client attaches, so just connect and
    # block until one arrives
    head = _get(f"/feed/{feed}.mjpg", 512)
    assert b"--frame" in head and b"image/jpeg" in head


def test_dashboard_streaming_layout_page(live_dashboard):
    page = _get("/stream").decode()
    assert "composite" in page and "Session" in page or "session" in page


def test_dashboard_404_on_unknown_feed(live_dashboard):
    with pytest.raises(Exception):
        _get("/feed/nonsense.mjpg", 10)


def test_feed_lifecycle_stops_server_side_rendering(live_dashboard):
    """The reference's FeedThreads are start/stoppable (feeds.py:41-57);
    here /feed/<name>/stop must stop the SERVER from rendering the feed,
    not just the client from displaying it."""
    import time as _time
    import urllib.request

    # watched + enabled -> active
    live_dashboard._attach("control", +1)
    assert live_dashboard._feed_active("control")

    req = urllib.request.Request(
        "http://127.0.0.1:18793/feed/control/stop"
    )
    with urllib.request.urlopen(req, timeout=20) as r:
        assert r.status == 204
    assert not live_dashboard._feed_active("control")
    # renderer skips the stopped feed: its frame stops being refreshed
    _time.sleep(0.3)
    before = live_dashboard._frame("control")
    _time.sleep(0.3)
    assert live_dashboard._frame("control") == before

    with urllib.request.urlopen(
        "http://127.0.0.1:18793/feed/control/start", timeout=20
    ) as r:
        assert r.status == 204
    assert live_dashboard._feed_active("control")
    live_dashboard._attach("control", -1)
    # nobody watching -> inactive even though enabled
    assert not live_dashboard._feed_active("control")
