"""Localisation benchmark recordings: capture + replay.

Format-compatible with the reference's recordings
(/root/reference/src/acmpc/localisation/benchmarking/utils.py:14-29 and
the capture sites agent.py:267-278, localiser.py:581-583): two pickled
dicts — ``control.npy`` of {i: {time, control_command, game_pose}} and
``observations.npy`` of {i: {time, tracklimits}} — merged and replayed
sorted by timestamp.
"""

from __future__ import annotations

import pathlib
from typing import Dict, List

import numpy as np


class LocalisationRecording:
    """Time-sorted merge of a control + observation recording."""

    def __init__(self, data_path: str):
        control = np.load(
            pathlib.Path(data_path) / "control.npy", allow_pickle=True
        ).item()
        observations = np.load(
            pathlib.Path(data_path) / "observations.npy", allow_pickle=True
        ).item()
        records: List[Dict] = list(control.values()) + list(observations.values())
        self._recording = sorted(records, key=lambda r: r["time"])

    def __getitem__(self, index: int) -> Dict:
        return self._recording[index]

    def __len__(self) -> int:
        return len(self._recording)

    def __iter__(self):
        return iter(self._recording)


class LocalisationRecorder:
    """Capture-side: accumulate control/observation records during a run
    and save them in the replayable layout."""

    def __init__(self, save_dir: str):
        self._dir = pathlib.Path(save_dir)
        self._dir.mkdir(parents=True, exist_ok=True)
        self._control: Dict[int, Dict] = {}
        self._observations: Dict[int, Dict] = {}

    def record_control(self, t: float, control_command, game_pose):
        self._control[len(self._control)] = {
            "time": t,
            "control_command": tuple(control_command),
            "game_pose": [game_pose],
        }

    def record_observation(self, t: float, left: np.ndarray, right: np.ndarray):
        self._observations[len(self._observations)] = {
            "time": t,
            "tracklimits": {
                "left": np.asarray(left),
                "right": np.asarray(right),
            },
        }

    def save(self):
        np.save(self._dir / "control.npy", self._control, allow_pickle=True)
        np.save(
            self._dir / "observations.npy", self._observations, allow_pickle=True
        )
