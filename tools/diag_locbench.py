"""Diagnose localisation error structure on a committed recording.

Replays data/localisation/<track>_synth/racing through the production
filter (same path as tools/record_locbench.py --replay-only) but logs,
per control step:

  - position error decomposed into ALONG-TRACK (projected onto the local
    centreline tangent at the ground-truth pose) and LATERAL components;
  - particle cloud spread (max distance from estimate) and weight ESS;
  - converged flag.

Prints a time-bucketed table so the transient and the steady state are
separately visible, which VERDICT r3 asked for before touching the
filter. Run: JAX_PLATFORMS=cpu python tools/diag_locbench.py nordschleife
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

    # accept bare track names (oracle recordings, "<track>_synth") or a
    # full recording directory name like "monza_realperc"
    rec_dir = track if "_" in track else f"{track}_synth"
    base = track.split("_")[0]
    data_path = ROOT / "data" / "localisation" / rec_dir / "racing"
    map_path = ROOT / "data" / "maps" / f"{base}.npz"
    cfg = load_config(ROOT / "configs" / f"{base}.yaml")
    rec = LocalisationRecording(str(data_path))
    tm = load_track_map(map_path)
    centre = np.asarray(tm.centre)
    loc = Localiser(cfg.localisation, str(map_path), vehicle=cfg.vehicle, seed=0)

    rows = []  # (t, along, lateral, yaw_err, spread, ess, converged)
    last_t = None
    n_step = 0
    for r in rec:
        if "control_command" in r:
            dt = 0.0 if last_t is None else r["time"] - last_t
            last_t = r["time"]
            loc.step(r["control_command"], dt=dt)
            gt = r["game_pose"][0]
            if isinstance(gt, dict):
                gx, gy, gyaw = gt["x"], gt["y"], gt["yaw"]
            else:
                gt = np.asarray(gt).reshape(-1)
                gx, gy, gyaw = -gt[0], gt[2], gt[3]
            est = loc.estimated_position
            # local track tangent at the GT pose
            d2 = np.sum((centre - [gx, gy]) ** 2, axis=1)
            i = int(np.argmin(d2))
            tangent = centre[(i + 1) % len(centre)] - centre[i - 1]
            tangent = tangent / (np.linalg.norm(tangent) + 1e-9)
            err = est[:2] - [gx, gy]
            along = float(err @ tangent)
            lateral = float(err @ [-tangent[1], tangent[0]])
            yaw_err = float((gyaw - est[2] + np.pi) % (2 * np.pi) - np.pi)
            states = loc.particle_states
            scores = loc.particle_scores
            spread = (
                float(np.max(np.linalg.norm(states[:, :2] - est[:2], axis=1)))
                if len(states)
                else np.nan
            )
            w = scores / max(scores.sum(), 1e-30)
            ess = float(1.0 / max(np.sum(w**2), 1e-30))
            rows.append(
                (
                    n_step,
                    along,
                    lateral,
                    np.degrees(yaw_err),
                    spread,
                    ess,
                    loc.is_localised,
                )
            )
            n_step += 1
        elif "tracklimits" in r:
            obs = r["tracklimits"]
            loc.observe_tracklimits(obs["left"], obs["right"])

    rows = np.asarray(rows, dtype=float)
    print(f"track={track} steps={len(rows)}")
    print(
        f"{'bucket':>12} {'n':>5} {'|along|':>8} {'along':>8} {'|lat|':>7} "
        f"{'lat':>7} {'|yaw|':>6} {'spread':>7} {'ess':>6} {'%conv':>6}"
    )
    nb = 10
    for b in range(nb):
        lo, hi = b * len(rows) // nb, (b + 1) * len(rows) // nb
        r = rows[lo:hi]
        conv = r[:, 6] > 0.5
        print(
            f"{lo:>5}-{hi:<6} {len(r):>5} {np.mean(np.abs(r[:,1])):>8.2f} "
            f"{np.mean(r[:,1]):>8.2f} {np.mean(np.abs(r[:,2])):>7.2f} "
            f"{np.mean(r[:,2]):>7.2f} {np.mean(np.abs(r[:,3])):>6.2f} "
            f"{np.mean(r[:,4]):>7.1f} {np.mean(r[:,5]):>6.1f} "
            f"{100*np.mean(conv):>6.1f}"
        )
    # steady state = last half
    ss = rows[len(rows) // 2 :]
    conv = ss[:, 6] > 0.5
    cerr = ss[conv] if conv.any() else ss
    print(
        f"\nsteady-state (last half, converged-only): "
        f"|along|={np.mean(np.abs(cerr[:,1])):.2f} m  "
        f"|lat|={np.mean(np.abs(cerr[:,2])):.2f} m  "
        f"|x|+|y|-style={np.mean(np.abs(cerr[:,1]))+np.mean(np.abs(cerr[:,2])):.2f}  "
        f"%conv={100*np.mean(conv):.1f}"
    )


if __name__ == "__main__":
    for t in sys.argv[1:] or ["nordschleife"]:
        main(t)
