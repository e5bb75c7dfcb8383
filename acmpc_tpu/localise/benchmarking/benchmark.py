"""Offline localisation benchmark: replay a recording through the filter.

Counterpart of the reference BenchmarkLocalisation
(/root/reference/src/acmpc/localisation/benchmarking/
benchmark_localisation.py:13-78) — but needs no process-stripping shims:
the TPU filter is already synchronous and pure, so the replay drives the
production Localiser directly with recorded timestamps as dt
(test_localiser.py:40-48 semantics).
"""

from __future__ import annotations

from time import perf_counter
from typing import Dict, Optional

import numpy as np

from acmpc_tpu.config.schema import LocalisationConfig
from acmpc_tpu.dynamics.vehicle import VehicleParams
from acmpc_tpu.localise.benchmarking.recording import LocalisationRecording
from acmpc_tpu.localise.benchmarking.tracker import LocalisationTracker
from acmpc_tpu.localise.localiser import Localiser


class BenchmarkLocalisation:
    def __init__(
        self,
        data_path: str,
        map_path: str,
        localisation_cfg: LocalisationConfig,
        vehicle: Optional[VehicleParams] = None,
        seed: int = 0,
    ):
        np.random.seed(seed)
        self._recording = LocalisationRecording(data_path)
        self.localiser = Localiser(
            localisation_cfg, map_path, vehicle=vehicle, seed=seed
        )
        gt = [
            r["game_pose"][0]
            for r in self._recording
            if "game_pose" in r
        ]
        self.tracker = LocalisationTracker(self.localiser, gt)
        self._last_timestamp: Optional[float] = None

    def run(self, visualiser=None, max_steps: Optional[int] = None) -> Dict:
        """Replay the recording; an optional LocalisationVisualiser gets
        the reference's two update hooks (update_particles per control
        step, update_detections per observation) and can save the 9-panel
        figure afterwards. ``max_steps`` bounds the replay to the first N
        control steps (CI uses it to keep full-lap recordings test-sized;
        the shipped LOCBENCH numbers always replay the whole recording)."""
        n_steps = 0
        for record in self._recording:
            if "control_command" in record:
                if max_steps is not None and n_steps >= max_steps:
                    break
                n_steps += 1
                dt = self._dt(record["time"])
                t0 = perf_counter()
                self.localiser.step(record["control_command"], dt=dt)
                self.tracker.update_step(perf_counter() - t0)
                if visualiser is not None:
                    visualiser.update_particles()
            elif "tracklimits" in record:
                obs = record["tracklimits"]
                t0 = perf_counter()
                self.localiser.observe_tracklimits(obs["left"], obs["right"])
                self.tracker.update_observation(perf_counter() - t0)
                if visualiser is not None:
                    visualiser.update_detections(obs["left"], obs["right"])
        return self.tracker.summary()

    def _dt(self, timestamp: float) -> float:
        if self._last_timestamp is None:
            self._last_timestamp = timestamp
            return 0.0
        dt = timestamp - self._last_timestamp
        self._last_timestamp = timestamp
        return dt
