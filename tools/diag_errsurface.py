"""Probe the particle-scoring error surface around the TRUE pose.

For a handful of recorded observations with their ground-truth poses,
place synthetic particles at the true pose displaced along-track by
s in [-20, 20] m and laterally by d in [-5, 5] m, and print the mean
pairing error the filter would compute. If the minimum is not at
(0, 0), scoring is biased and accumulation converges confidently to the
wrong pose — the r3 symptom. Run:
JAX_PLATFORMS=cpu python tools/diag_errsurface.py nordschleife
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
    import jax.numpy as jnp

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
    for nm in ("centre", "left", "right"):
        b = np.asarray(getattr(tm, nm))
        seg = np.linalg.norm(np.diff(b, axis=0), axis=1)
        print(
            f"map {nm}: n={len(b)} spacing mean={seg.mean():.3f} "
            f"min={seg.min():.3f} max={seg.max():.3f}"
        )
    loc = Localiser(cfg.localisation, str(map_path), vehicle=cfg.vehicle, seed=0)
    pf = loc._pf

    # collect (obs, gt_pose) pairs: each observation matched with the
    # latest preceding control record's pose
    pairs = []
    last_pose = None
    for r in rec:
        if "control_command" in r:
            gt = r["game_pose"][0]
            if isinstance(gt, dict):
                last_pose = np.array([gt["x"], gt["y"], gt["yaw"]])
            else:
                g = np.asarray(gt).reshape(-1)
                last_pose = np.array([-g[0], g[2], g[3]])
        elif "tracklimits" in r and last_pose is not None:
            pairs.append((r["tracklimits"], last_pose.copy()))
    print(f"{len(pairs)} obs/pose pairs")

    # sample a few observations spread through the run
    picks = [len(pairs) // 8 * k for k in range(1, 8)]
    s_grid = np.arange(-20.0, 20.5, 1.0)
    d_grid = np.array([-3.0, -1.0, 0.0, 1.0, 3.0])
    for pi in picks:
        obs, pose = pairs[pi]
        ol, mlk, sl = loc._prepare(obs["left"])
        orr, mrk, sr = loc._prepare(obs["right"])
        no = int(np.asarray(mlk).sum() + np.asarray(mrk).sum())
        # raw observation spacing
        L = np.asarray(obs["left"])
        segL = np.linalg.norm(np.diff(L[:, :2], axis=0), axis=1)
        # tangent at true pose
        i = int(np.argmin(np.sum((centre - pose[:2]) ** 2, axis=1)))
        tang = centre[(i + 1) % len(centre)] - centre[i - 1]
        tang = tang / (np.linalg.norm(tang) + 1e-9)
        norm = np.array([-tang[1], tang[0]])
        # particle grid: displaced poses
        grid = []
        for d in d_grid:
            for s in s_grid:
                grid.append(
                    [pose[0] + s * tang[0] + d * norm[0],
                     pose[1] + s * tang[1] + d * norm[1],
                     pose[2]]
                )
        states = jnp.asarray(np.asarray(grid, np.float32))

        # replicate update()'s error computation
        from acmpc_tpu.localise.track_map import nearest_point

        cfgp = pf.config
        mlk2 = np.asarray(mlk) & (np.asarray(ol)[:, 1] < cfgp.observation_forward_limit)
        mrk2 = np.asarray(mrk) & (np.asarray(orr)[:, 1] < cfgp.observation_forward_limit)
        locs = states[:, :2]
        _, left_idx = nearest_point(locs, pf.map.left)
        _, right_idx = nearest_point(locs, pf.map.right)
        angle = -states[:, 2] + jnp.pi / 2
        cos, sin = jnp.cos(angle), jnp.sin(angle)
        rot = jnp.stack([jnp.stack([cos, sin], -1), jnp.stack([-sin, cos], -1)], -2)
        obs_cat = jnp.concatenate([ol, orr], axis=0)
        obs_mask = np.concatenate([mlk2, mrk2], axis=0)
        obs_world = jnp.einsum("nij,pj->npi", rot, obs_cat) + locs[:, None, :]
        p = ol.shape[0]
        seq = jnp.arange(p)
        mlN, mrN = pf.map.left.shape[0], pf.map.right.shape[0]
        left_slice = pf.map.left[jnp.mod(left_idx[:, None] + sl + seq[None, :], mlN)]
        right_slice = pf.map.right[jnp.mod(right_idx[:, None] + sr + seq[None, :], mrN)]
        limits = jnp.concatenate([left_slice, right_slice], axis=1)
        err = jnp.linalg.norm(obs_world - limits, axis=2)
        denom = max(obs_mask.sum(), 1)
        mean_err = np.asarray(jnp.sum(err * obs_mask[None, :], axis=1) / denom)
        mean_err = mean_err.reshape(len(d_grid), len(s_grid))
        best = np.unravel_index(np.argmin(mean_err), mean_err.shape)
        print(
            f"\nobs#{pi}: n_obs={no} rawL spacing={segL.mean():.2f} "
            f"starts=({int(sl)},{int(sr)})  "
            f"min err={mean_err[best]:.2f} at s={s_grid[best[1]]:+.0f} "
            f"d={d_grid[best[0]]:+.0f}  err@0,0={mean_err[2, len(s_grid)//2]:.2f}"
        )
        row = mean_err[2]  # d=0 row
        line = " ".join(f"{v:5.1f}" for v in row[::2])
        print(f"  d=0 err vs s in {s_grid[0]:.0f}..{s_grid[-1]:.0f} step2: {line}")


if __name__ == "__main__":
    for t in sys.argv[1:] or ["nordschleife"]:
        main(t)
