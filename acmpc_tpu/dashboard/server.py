"""Headless dashboard: background renderer + HTTP MJPEG/JSON server.

The reference ships a PyQt6/QML dashboard process: a 3x3 feed grid with
six independently start/stoppable ~50 Hz feed threads (camera,
segmentation, control, semantics, local localisation, map localisation —
dashboard.py:38-43, ui/FeedGrid.qml) and a session summary pane with
current/last lap and per-sector times, deltas and best/improved colouring
(ui/SessionSummary.qml, backend/session_information.py). This framework
serves the same surface over plain HTTP — per-feed MJPEG endpoints
(/feed/<name>.mjpg), a composite (/feed.mjpg), a JSON session endpoint and
an HTML feed-grid page with per-feed toggles — which works over SSH to a
TPU pod where no display exists.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional

import numpy as np

from acmpc_tpu.dashboard.render import (
    compose_dashboard,
    render_bev,
    render_local_localisation,
    render_semantics,
    render_world_map,
)
from acmpc_tpu.dashboard.session import SessionTracker

# role-equivalents of the reference's six feeds (dashboard.py:38-43)
FEED_NAMES = (
    "camera",
    "segmentation",
    "control",
    "semantics",
    "localisation",
    "map",
)

_PAGE = b"""<!doctype html>
<html><head><title>acmpc_tpu dashboard</title>
<style>
body{background:#14141c;color:#ddd;font-family:system-ui,sans-serif;margin:0}
h3{margin:10px 14px}
#wrap{display:flex}
#grid{display:grid;grid-template-columns:repeat(3,1fr);gap:8px;padding:8px;flex:3}
.cell{border:1px solid slategray;border-radius:4px;padding:4px;text-align:center}
.cell img{width:100%;background:#000;min-height:120px}
.cell button{margin:4px;background:#2a2a38;color:#ddd;border:1px solid slategray;
  border-radius:4px;padding:3px 12px;cursor:pointer}
#session{flex:1;padding:14px;font-family:ui-monospace,monospace;min-width:300px}
table{border-collapse:collapse;width:100%;margin-bottom:14px}
td,th{padding:2px 8px;text-align:left;font-size:14px}
.lap-title{font-size:18px;font-weight:bold;margin:8px 0 2px}
</style></head>
<body><h3>acmpc_tpu</h3>
<div id=wrap>
<div id=grid></div>
<div id=session></div>
</div>
<script>
const FEEDS=["camera","segmentation","control","semantics","localisation","map"];
const grid=document.getElementById("grid");
for(const f of FEEDS){
  const c=document.createElement("div");c.className="cell";
  c.innerHTML=`<img id="img-${f}" alt="${f}">`+
    `<div>${f} <button id="btn-${f}">Stop</button></div>`;
  grid.appendChild(c);
  const img=c.querySelector("img"),btn=c.querySelector("button");
  let on=false;
  const set=(v)=>{on=v;btn.textContent=v?"Stop":"Start";
    img.src=v?`/feed/${f}.mjpg`:"";};
  btn.onclick=()=>set(!on);
  set(true);
}
const row=(label,e)=>e?`<tr><td>${label}</td>`+
  `<td style="color:${e.colour}">${e.time}</td>`+
  `<td>${e.delta||""}</td></tr>`:"";
setInterval(async()=>{
  const s=await (await fetch("/session.json")).json();
  const lapTable=(title,lap)=>{
    if(!lap)return "";
    let h=`<div class=lap-title>${title}</div><table>`;
    h+=row("Time",lap);
    (lap.sectors||[]).forEach((sec,i)=>h+=row(`Sector ${i+1}`,sec));
    return h+"</table>";
  };
  document.getElementById("session").innerHTML=
    `<div class=lap-title>Lap ${s.completed_laps+1}</div>`+
    lapTable("Current Lap",s.current)+
    lapTable("Last Lap",s.last)+
    `<div class=lap-title>Best</div><table><tr><td>Lap</td>`+
    `<td style="color:purple">${s.best_lap}</td></tr>`+
    (s.best_sectors||[]).map((t,i)=>`<tr><td>Sector ${i+1}</td><td>${t}</td></tr>`).join("")+
    `</table>`;
},500);
</script></body></html>"""


class Dashboard:
    """Attach to an agent (+ optionally the synthetic sim) and serve."""

    def __init__(self, agent, sim=None, port: int = 8793, fps: float = 10.0):
        self.agent = agent
        self.sim = sim
        self.port = port
        self.fps = fps
        self.session = SessionTracker()
        self._frames: Dict[str, bytes] = {}
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
                state = getattr(self.agent, "_latest_state", None)
                if state:
                    self.session.update(state)
                panels = self._render_panels()
                encoded = {}
                for name, frame in panels.items():
                    if frame is None:
                        continue
                    if frame.ndim == 2:
                        frame = np.repeat(frame[..., None], 3, axis=2)
                    if frame.dtype != np.uint8:
                        frame = np.clip(frame, 0, 255).astype(np.uint8)
                    ok, buf = cv2.imencode(
                        ".jpg", frame, [int(cv2.IMWRITE_JPEG_QUALITY), 80]
                    )
                    if ok:
                        encoded[name] = buf.tobytes()
                composite = compose_dashboard(
                    {k: v for k, v in panels.items() if v is not None}
                )
                ok, buf = cv2.imencode(
                    ".jpg", composite, [int(cv2.IMWRITE_JPEG_QUALITY), 80]
                )
                if ok:
                    encoded["composite"] = buf.tobytes()
                with self._frame_lock:
                    self._frames.update(encoded)
            except Exception:
                pass
            time.sleep(max(0.0, interval - (time.monotonic() - t0)))

    def _render_panels(self) -> Dict[str, Optional[np.ndarray]]:
        """One frame per feed, role-matched to the reference's grid."""
        agent = self.agent
        panels: Dict[str, Optional[np.ndarray]] = {}
        frames = getattr(agent, "_latest_frames", {}) or {}

        cam = frames.get("camera")
        panels["camera"] = None if cam is None else np.asarray(cam)

        seg = frames.get("segmentation")
        panels["segmentation"] = (
            None if seg is None else (np.asarray(seg) * 255).astype(np.uint8)
        )

        sem = frames.get("semantics")
        panels["semantics"] = (
            None if sem is None else render_semantics(np.asarray(sem))
        )

        tracks = getattr(agent, "_latest_tracks", None)
        prediction = agent.controller.predicted_locations
        panels["control"] = render_bev(tracks, prediction)

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
        panels["localisation"] = render_local_localisation(
            map_polys, particles, estimate, car
        )

        if panels["segmentation"] is None and self.sim is not None:
            mask = self.sim.render_drivable_mask()
            panels["segmentation"] = (mask * 255).astype(np.uint8)
        return panels

    def _frame(self, name: str) -> Optional[bytes]:
        with self._frame_lock:
            return self._frames.get(name)

    # -- http ------------------------------------------------------------
    def _make_handler(self):
        dashboard = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet
                pass

            def _stream(self, name: str):
                self.send_response(200)
                self.send_header(
                    "Content-Type",
                    "multipart/x-mixed-replace; boundary=frame",
                )
                self.end_headers()
                try:
                    while not dashboard._stop.is_set():
                        frame = dashboard._frame(name)
                        if frame is not None:
                            self.wfile.write(b"--frame\r\n")
                            self.send_header("Content-Type", "image/jpeg")
                            self.send_header(
                                "Content-Length", str(len(frame))
                            )
                            self.end_headers()
                            self.wfile.write(frame)
                            self.wfile.write(b"\r\n")
                        time.sleep(1.0 / dashboard.fps)
                except (BrokenPipeError, ConnectionResetError):
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
                    self._stream("composite")
                elif self.path.startswith("/feed/") and self.path.endswith(
                    ".mjpg"
                ):
                    name = self.path[len("/feed/") : -len(".mjpg")]
                    if name in FEED_NAMES:
                        self._stream(name)
                    else:
                        self.send_response(404)
                        self.end_headers()
                else:
                    self.send_response(404)
                    self.end_headers()

        return Handler
