"""Headless dashboard: background renderer + HTTP MJPEG/JSON server.

The reference ships a PyQt6/QML dashboard process with six ~50 Hz feed
threads and a 100 ms session poller
(/root/reference/src/acmpc/dashboard/dashboard.py:47-104,
backend/feeds.py:23-242). This framework serves the same live views over
plain HTTP — an MJPEG composite at /feed.mjpg, a JSON session endpoint,
and a minimal HTML page — which works over SSH to a TPU pod where no
display exists.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from acmpc_tpu.dashboard.render import (
    compose_dashboard,
    render_bev,
    render_world_map,
)
from acmpc_tpu.dashboard.session import SessionTracker

_PAGE = b"""<!doctype html>
<html><head><title>acmpc_tpu dashboard</title>
<style>body{background:#111;color:#eee;font-family:monospace}
img{max-width:100%%}</style></head>
<body><h3>acmpc_tpu</h3><img src="/feed.mjpg">
<pre id="s"></pre>
<script>setInterval(async()=>{const r=await fetch('/session.json');
document.getElementById('s').textContent=JSON.stringify(await r.json(),null,1);},500)
</script></body></html>"""


class Dashboard:
    """Attach to an agent (+ optionally the synthetic sim) and serve."""

    def __init__(self, agent, sim=None, port: int = 8793, fps: float = 10.0):
        self.agent = agent
        self.sim = sim
        self.port = port
        self.fps = fps
        self.session = SessionTracker()
        self._frame: Optional[bytes] = None
        self._frame_lock = threading.Lock()
        self._stop = threading.Event()
        self._render_thread: Optional[threading.Thread] = None
        self._server: Optional[ThreadingHTTPServer] = None

    # -- lifecycle -------------------------------------------------------
    def start(self):
        self._render_thread = threading.Thread(
            target=self._render_loop, daemon=True, name="acmpc-dashboard"
        )
        self._render_thread.start()
        handler = self._make_handler()
        self._server = ThreadingHTTPServer(("0.0.0.0", self.port), handler)
        threading.Thread(
            target=self._server.serve_forever, daemon=True
        ).start()

    def stop(self):
        self._stop.set()
        if self._server is not None:
            self._server.shutdown()
            self._server = None

    def update_session(self, state: dict):
        self.session.update(state)

    # -- rendering -------------------------------------------------------
    def _render_loop(self):
        import cv2

        interval = 1.0 / self.fps
        while not self._stop.is_set():
            t0 = time.monotonic()
            try:
                frame = self._render_frame()
                ok, buf = cv2.imencode(
                    ".jpg", frame, [int(cv2.IMWRITE_JPEG_QUALITY), 80]
                )
                if ok:
                    with self._frame_lock:
                        self._frame = buf.tobytes()
            except Exception:
                pass
            time.sleep(max(0.0, interval - (time.monotonic() - t0)))

    def _render_frame(self) -> np.ndarray:
        panels = {}
        agent = self.agent
        tracks = getattr(agent, "_latest_tracks", None)
        prediction = agent.controller.predicted_locations
        panels["bev"] = render_bev(tracks, prediction)

        map_polys = None
        particles = None
        estimate = None
        if agent.localiser is not None:
            m = agent.localiser.map
            map_polys = {
                "centre": np.asarray(m.centre),
                "left": np.asarray(m.left),
                "right": np.asarray(m.right),
            }
            particles = agent.localiser.particle_states
            estimate = agent.localiser.estimated_position
        car = self.sim.pose if self.sim is not None else None
        panels["map"] = render_world_map(map_polys, particles, estimate, car)

        if self.sim is not None:
            mask = self.sim.render_drivable_mask()
            panels["mask"] = (mask * 255).astype(np.uint8)
        return compose_dashboard(panels)

    # -- http ------------------------------------------------------------
    def _make_handler(self):
        dashboard = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet
                pass

            def do_GET(self):
                if self.path in ("/", "/index.html"):
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.end_headers()
                    self.wfile.write(_PAGE)
                elif self.path == "/session.json":
                    body = json.dumps(dashboard.session.snapshot()).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.end_headers()
                    self.wfile.write(body)
                elif self.path == "/feed.mjpg":
                    self.send_response(200)
                    self.send_header(
                        "Content-Type",
                        "multipart/x-mixed-replace; boundary=frame",
                    )
                    self.end_headers()
                    try:
                        while not dashboard._stop.is_set():
                            with dashboard._frame_lock:
                                frame = dashboard._frame
                            if frame is not None:
                                self.wfile.write(b"--frame\r\n")
                                self.send_header("Content-Type", "image/jpeg")
                                self.send_header("Content-Length", str(len(frame)))
                                self.end_headers()
                                self.wfile.write(frame)
                                self.wfile.write(b"\r\n")
                            time.sleep(1.0 / dashboard.fps)
                    except (BrokenPipeError, ConnectionResetError):
                        pass
                else:
                    self.send_response(404)
                    self.end_headers()

        return Handler
