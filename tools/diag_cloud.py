"""Steady-state cloud anatomy: is the +10 m along-track bias in the
weights (scoring prefers ahead-of-truth in replay conditions) or in the
estimator (weights favour truth but the mean is skewed)?

Replays a committed recording; in the last quarter of the run, at every
20th control step, dumps: weighted-mean along-track offset, argmax-weight
particle's offset, top-50-by-weight mean offset, bottom-200 mean offset,
and the correlation between log-weight and offset.

Run: JAX_PLATFORMS=cpu python tools/diag_cloud.py nordschleife
"""

from __future__ import annotations

import os
import pathlib
import sys

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    import jax

    jax.config.update("jax_platforms", "cpu")


def main(track: str):
    from acmpc_tpu.config import load_config
    from acmpc_tpu.localise.benchmarking.recording import LocalisationRecording
    from acmpc_tpu.localise.localiser import Localiser
    from acmpc_tpu.localise.track_map import load_track_map

    data_path = ROOT / "data" / "localisation" / f"{track}_synth" / "racing"
    map_path = ROOT / "data" / "maps" / f"{track}.npz"
    cfg = load_config(ROOT / "configs" / f"{track}.yaml")
    rec = LocalisationRecording(str(data_path))
    tm = load_track_map(map_path)
    centre = np.asarray(tm.centre)
    loc = Localiser(cfg.localisation, str(map_path), vehicle=cfg.vehicle, seed=0)

    n_controls = sum(1 for r in rec if "control_command" in r)
    start_dump = 3 * n_controls // 4
    last_t = None
    n_step = 0
    print(
        f"{'step':>5} {'wmean':>7} {'argmax':>7} {'top50':>7} {'bot200':>7} "
        f"{'corr':>6} {'spread_s':>8}"
    )
    for r in rec:
        if "control_command" in r:
            dt = 0.0 if last_t is None else r["time"] - last_t
            last_t = r["time"]
            loc.step(r["control_command"], dt=dt)
            n_step += 1
            if n_step >= start_dump and n_step % 20 == 0:
                gt = r["game_pose"][0]
                gx, gy = gt["x"], gt["y"]
                i = int(np.argmin(np.sum((centre - [gx, gy]) ** 2, axis=1)))
                tang = centre[(i + 1) % len(centre)] - centre[i - 1]
                tang = tang / (np.linalg.norm(tang) + 1e-9)
                states = loc.particle_states
                scores = loc.particle_scores
                off = (states[:, :2] - [gx, gy]) @ tang
                w = scores / max(scores.sum(), 1e-30)
                order = np.argsort(-w)
                top50 = off[order[:50]].mean()
                bot200 = off[order[-200:]].mean()
                logw = np.log(np.maximum(w, 1e-30))
                corr = (
                    np.corrcoef(logw, off)[0, 1] if np.std(off) > 1e-6 else np.nan
                )
                print(
                    f"{n_step:>5} {float(off @ w):>7.2f} "
                    f"{off[order[0]]:>7.2f} {top50:>7.2f} {bot200:>7.2f} "
                    f"{corr:>6.2f} {np.std(off):>8.2f}"
                )
        elif "tracklimits" in r:
            obs = r["tracklimits"]
            loc.observe_tracklimits(obs["left"], obs["right"])


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "nordschleife")
