"""Benchmark visualisation: summary figure for a replay run.

Counterpart of the reference's 9-panel live matplotlib dashboard
(/root/reference/src/acmpc/localisation/benchmarking/visualisation.py:22-39)
— rendered headless to a file at the end of the replay instead of live
(pods have no display; the live view is the HTTP dashboard).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class LocalisationVisualiser:
    def __init__(self, localiser, tracker):
        self._localiser = localiser
        self._tracker = tracker
        self._particle_snapshots = []
        self._estimates = []

    def update_particles(self):
        states = self._localiser.particle_states
        if len(self._particle_snapshots) < 50:  # bounded memory
            self._particle_snapshots.append(np.copy(states[:: max(1, len(states) // 100)]))
        self._estimates.append(np.copy(self._localiser.estimated_position))

    def save_figure(self, path: str, gt_poses: Optional[list] = None):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(2, 3, figsize=(18, 10), dpi=120)
        (ax_map, ax_err, ax_exec), (ax_yaw, ax_loc, ax_conv) = axes

        m = self._localiser.map
        for poly, c in [(m.left, "#888"), (m.right, "#888"), (m.centre, "#4a4")]:
            p = np.asarray(poly)
            ax_map.plot(p[:, 0], p[:, 1], ".", ms=0.5, color=c)
        if self._estimates:
            est = np.asarray(self._estimates)
            ax_map.plot(est[:, 0], est[:, 1], "-", lw=1, color="red", label="estimate")
        if gt_poses:
            gt = np.asarray(
                [[-p[0], p[2]] if not isinstance(p, dict) else [p["x"], p["y"]] for p in gt_poses]
            )
            ax_map.plot(gt[:, 0], gt[:, 1], "-", lw=1, color="blue", label="ground truth")
        ax_map.set_aspect(1)
        ax_map.legend()
        ax_map.set_title("map / trajectory")

        errs = self._tracker._errors
        if errs["x"]:
            ax_err.plot(np.abs(errs["x"]), label="|x| err")
            ax_err.plot(np.abs(errs["y"]), label="|y| err")
            ax_err.legend()
        ax_err.set_title("position error (m)")
        if errs["yaw"]:
            ax_yaw.plot(np.degrees(np.abs(errs["yaw"])))
        ax_yaw.set_title("rotation error (deg)")

        ax_exec.hist(
            np.asarray(self._tracker.step_execution_times) * 1e3,
            bins=40, alpha=0.6, label="step",
        )
        ax_exec.hist(
            np.asarray(self._tracker.observation_execution_times) * 1e3,
            bins=40, alpha=0.6, label="observation",
        )
        ax_exec.set_title("execution time (ms)")
        ax_exec.legend()

        s = self._tracker.summary()
        ax_loc.axis("off")
        ax_loc.text(
            0.05, 0.5,
            "\n".join(f"{k}: {v}" for k, v in s.items()),
            fontsize=12, family="monospace", va="center",
        )
        if self._estimates:
            est = np.asarray(self._estimates)
            ax_conv.plot(est[:, 0], label="x̂")
            ax_conv.plot(est[:, 1], label="ŷ")
            ax_conv.legend()
        ax_conv.set_title("estimate trace")
        fig.tight_layout()
        fig.savefig(path)
        return path
