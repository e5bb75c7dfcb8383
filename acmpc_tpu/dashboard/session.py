"""Session information: lap/sector bookkeeping.

Counterpart of the reference SessionInformationProvider
(/root/reference/src/acmpc/dashboard/backend/session_information.py:25-476)
— lap history with best/last deltas and F1-style colour classification,
polled from the live observation stream, exposed as JSON instead of Qt
properties.
"""

from __future__ import annotations

from typing import Dict, List, Optional

COLOUR_BEST = "purple"  # overall best
COLOUR_IMPROVED = "green"  # personal improvement
COLOUR_NORMAL = "yellow"


def format_time(milliseconds: float) -> str:
    """mm:ss.mmm (reference session_information.py:454-476)."""
    if milliseconds is None or milliseconds <= 0:
        return "--:--.---"
    ms = int(milliseconds)
    minutes, ms = divmod(ms, 60000)
    seconds, ms = divmod(ms, 1000)
    return f"{minutes:02d}:{seconds:02d}.{ms:03d}"


class SessionTracker:
    def __init__(self):
        self.laps: List[Dict] = []
        self.best_time_ms: Optional[float] = None
        self._last_lap_count = 0
        self.current_lap_ms = 0.0
        self.current_sector = 0
        self.sector_times: List[float] = []

    def update(self, state: Dict):
        self.current_lap_ms = state.get("i_current_time", 0)
        self.current_sector = state.get("current_sector_index", 0)
        laps = state.get("completed_laps", 0)
        if laps > self._last_lap_count:
            last_ms = state.get("i_last_time", self.current_lap_ms)
            improved = self.best_time_ms is None or last_ms < self.best_time_ms
            if improved:
                self.best_time_ms = last_ms
            self.laps.append(
                {
                    "lap": laps,
                    "time_ms": last_ms,
                    "time": format_time(last_ms),
                    "colour": COLOUR_BEST if improved else COLOUR_NORMAL,
                    "delta_ms": (
                        0 if improved else last_ms - self.best_time_ms
                    ),
                }
            )
            self._last_lap_count = laps

    def snapshot(self) -> Dict:
        return {
            "current_lap": format_time(self.current_lap_ms),
            "best_lap": format_time(self.best_time_ms or 0),
            "current_sector": self.current_sector,
            "completed_laps": self._last_lap_count,
            "laps": self.laps[-10:],
        }
