"""Decisive probe: per-frame score tilt along-track, live conditions.

Replays a committed recording; in the last quarter, every 10th
observation it (a) recomputes the PER-FRAME mean pairing error of the
live particle cloud and regresses it against each particle's along-track
offset from ground truth, and (b) probes a yaw-ADAPTED error surface:
particles displaced s in [-15, 15] m along the centreline, each with
yaw equal to the LOCAL track heading at its displaced position plus the
car's current heading offset (what a converged shifted cloud would look
like). If (b) has its minimum away from 0 — or is flat — the
index-matched pairing has no/biased along-track signal once yaw adapts,
which fixed-yaw probes hide.

Run: JAX_PLATFORMS=cpu python tools/diag_tilt.py nordschleife
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


def mean_pairing_error(pf, states, ol, mlk, orr, mrk, sl, sr):
    """Replicate ParticleFilter.update()'s mean_err for given states."""
    import jax.numpy as jnp

    from acmpc_tpu.localise.track_map import nearest_point

    cfgp = pf.config
    mlk = np.asarray(mlk) & (np.asarray(ol)[:, 1] < cfgp.observation_forward_limit)
    mrk = np.asarray(mrk) & (np.asarray(orr)[:, 1] < cfgp.observation_forward_limit)
    states = jnp.asarray(states, jnp.float32)
    locs = states[:, :2]
    _, left_idx = nearest_point(locs, pf.map.left)
    _, right_idx = nearest_point(locs, pf.map.right)
    angle = -states[:, 2] + jnp.pi / 2
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    rot = jnp.stack([jnp.stack([cos, sin], -1), jnp.stack([-sin, cos], -1)], -2)
    obs_cat = jnp.concatenate([ol, orr], axis=0)
    obs_mask = np.concatenate([mlk, mrk], axis=0)
    obs_world = jnp.einsum("nij,pj->npi", rot, obs_cat) + locs[:, None, :]
    p = ol.shape[0]
    seq = jnp.arange(p)
    mlN, mrN = pf.map.left.shape[0], pf.map.right.shape[0]
    left_slice = pf.map.left[jnp.mod(left_idx[:, None] + sl + seq[None, :], mlN)]
    right_slice = pf.map.right[jnp.mod(right_idx[:, None] + sr + seq[None, :], mrN)]
    limits = jnp.concatenate([left_slice, right_slice], axis=1)
    err = jnp.linalg.norm(obs_world - limits, axis=2)
    denom = max(obs_mask.sum(), 1)
    return np.asarray((err * obs_mask[None, :]).sum(axis=1) / denom)


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
    # arclength along centre for displacement
    seg = np.linalg.norm(np.diff(centre, axis=0), axis=1)
    spacing = float(seg.mean())
    loc = Localiser(cfg.localisation, str(map_path), vehicle=cfg.vehicle, seed=0)
    pf = loc._pf

    n_obs_total = sum(1 for r in rec if "tracklimits" in r)
    start_dump = 3 * n_obs_total // 4
    s_grid = np.arange(-15.0, 15.5, 1.5)
    last_t = None
    gt_pose = None
    n_obs = 0
    print(f"{'obs':>5} {'live_tilt':>10} {'live_err@mean':>13} " f"surface(min_s, err@min, err@0)")
    for r in rec:
        if "control_command" in r:
            dt = 0.0 if last_t is None else r["time"] - last_t
            last_t = r["time"]
            loc.step(r["control_command"], dt=dt)
            gt = r["game_pose"][0]
            gt_pose = np.array([gt["x"], gt["y"], gt["yaw"]])
        elif "tracklimits" in r:
            obs = r["tracklimits"]
            do_dump = n_obs >= start_dump and n_obs % 10 == 0 and gt_pose is not None
            if do_dump:
                ol, mlk, sl = loc._prepare(obs["left"])
                orr, mrk, sr = loc._prepare(obs["right"])
                # (a) live cloud per-frame error vs offset
                states = loc.particle_states
                i = int(np.argmin(np.sum((centre - gt_pose[:2]) ** 2, axis=1)))
                tang = centre[(i + 1) % len(centre)] - centre[i - 1]
                tang = tang / (np.linalg.norm(tang) + 1e-9)
                off = (states[:, :2] - gt_pose[:2]) @ tang
                errs = mean_pairing_error(pf, states, ol, mlk, orr, mrk, sl, sr)
                A = np.vstack([off, np.ones_like(off)]).T
                slope = np.linalg.lstsq(A, errs, rcond=None)[0][0]
                # (b) yaw-adapted displaced surface
                yaw_off = gt_pose[2] - np.arctan2(tang[1], tang[0])
                yaw_off = (yaw_off + np.pi) % (2 * np.pi) - np.pi
                probe = []
                for s in s_grid:
                    j = (i + int(round(s / spacing))) % len(centre)
                    t2 = centre[(j + 1) % len(centre)] - centre[j - 1]
                    th = np.arctan2(t2[1], t2[0])
                    n2 = np.array([-np.sin(th), np.cos(th)])
                    # keep the car's lateral offset and heading offset
                    lat = (gt_pose[:2] - centre[i]) @ np.array(
                        [-tang[1], tang[0]]
                    )
                    probe.append(
                        [
                            centre[j][0] + lat * n2[0],
                            centre[j][1] + lat * n2[1],
                            th + yaw_off,
                        ]
                    )
                perrs = mean_pairing_error(
                    pf, np.asarray(probe, np.float32), ol, mlk, orr, mrk, sl, sr
                )
                k = int(np.argmin(perrs))
                row = " ".join(f"{v:4.1f}" for v in perrs)
                print(
                    f"{n_obs:>5} {slope:>10.4f} {errs.mean():>13.2f} "
                    f"min_s={s_grid[k]:+5.1f} err@min={perrs[k]:.2f} "
                    f"err@0={perrs[len(s_grid)//2]:.2f}"
                )
                print(f"      surface: {row}")
            loc.observe_tracklimits(obs["left"], obs["right"])
            n_obs += 1


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "nordschleife")
