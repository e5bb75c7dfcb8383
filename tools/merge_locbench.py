"""Merge per-track locbench replay results into LOCBENCH.json.

The round-5 replays run as parallel single-track processes for wall-clock
(nordschleife's 18k-step full lap dominates a serial run); each process
prints its per-track JSON line to its log and writes a partial --out
file. This tool folds every ``[track] {...}`` line found in the given
logs into LOCBENCH.json's ``tracks`` map, preserving entries that no log
refreshes (last write wins per track).

Run: python tools/merge_locbench.py locbench_r5*.log
"""

from __future__ import annotations

import json
import pathlib
import re
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent

LINE = re.compile(r"^\[([a-z_]+)\] (\{.*\})\s*$")


def main(logs: list[str]) -> None:
    out_path = ROOT / "LOCBENCH.json"
    doc = json.loads(out_path.read_text())
    merged = []
    for log in logs:
        for line in pathlib.Path(log).read_text().splitlines():
            m = LINE.match(line)
            if not m:
                continue
            track, payload = m.group(1), json.loads(m.group(2))
            doc["tracks"][track] = payload
            merged.append(track)
    doc["metrics"] = (
        "reference benchmark_localisation.py:17-25 triple + transient/"
        "steady-state split; reference_filter = the REFERENCE's particle "
        "filter (localiser.py:132-661 run in place via "
        "tools/reference_bridge.py) replayed on the SAME recording"
    )
    out_path.write_text(json.dumps(doc, indent=2) + "\n")
    print(f"merged {merged} -> {out_path}")


if __name__ == "__main__":
    main(sys.argv[1:])
