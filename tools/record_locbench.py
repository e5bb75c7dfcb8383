"""Record + replay the localisation benchmark and write LOCBENCH.json.

The reference's offline benchmark prints three metrics — % steps
localised, mean position error, mean rotation error
(/root/reference/src/acmpc/benchmark_localisation.py:17-25) — but ships
no recorded results. This tool produces ours, reproducibly:

1. drive the synthetic simulator around the SHIPPED per-track map
   stand-in with the production agent (oracle perception, localisation
   on, benchmark capture on), writing control.npy + observations.npy to
   the data_path named by configs/benchmarks/<track>.yaml;
2. replay that recording through the production particle filter via
   BenchmarkLocalisation (the reference's replay semantics);
3. write the per-track metrics to LOCBENCH.json at the repo root.

Run:  python tools/record_locbench.py [--tracks monza nordschleife]
      [--steps 800]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def record_track(track: str, steps: int, data_path: pathlib.Path) -> dict:
    """Drive the synthetic sim on the shipped <track> map with the
    production localisation config, capturing the benchmark recording."""
    from acmpc_tpu.config import load_config
    from acmpc_tpu.perception.camera import CameraInfo
    from acmpc_tpu.runtime import Agent, SyntheticSimulator
    from acmpc_tpu.localise.track_map import load_track_map

    map_path = ROOT / "data" / "maps" / f"{track}.npz"
    cfg = load_config(ROOT / "configs" / f"{track}.yaml")
    cfg = dataclasses.replace(
        cfg,
        # oracle perception feeds geometry straight from the sim; shrink
        # the camera so the (unused) segmentation path stays cheap
        perception=dataclasses.replace(
            cfg.perception,
            image_width=320,
            image_height=192,
            n_rows_to_remove_bonnet=160,
            n_polyfit_points=200,
        ),
        racing_control=dataclasses.replace(
            cfg.racing_control, horizon=20
        ),
        localisation=dataclasses.replace(
            cfg.localisation,
            use_localisation=True,
            collect_benchmark_observations=True,
            benchmark_observations_save_location=str(data_path),
        ),
        map_path=str(map_path),
        collect_images=0,
    )
    tm = load_track_map(map_path)
    sim = SyntheticSimulator(
        tm,
        CameraInfo.from_config(cfg.perception),
        dt=0.05,
        start_index=50,
        half_width=5.0,
    )
    agent = Agent(cfg, sim, use_oracle_perception=True)
    obs = sim.reset()
    agent.behaviour(obs)
    assert agent.controller.wait_for_first_command(timeout=300)
    # pre-compile the PF update so the worker thread doesn't drop frames
    # during the first observe's jit compile, then reset the filter
    dummy = np.zeros((4, 2), np.float32)
    agent.localiser.observe_tracklimits(dummy, dummy)
    agent.localiser.reset(seed=cfg.seed)
    for _ in range(steps):
        obs = sim.step(agent.behaviour(obs))
        time.sleep(0.002)  # give the perception worker a slot
    agent.teardown()
    return {"map_path": str(map_path), "cfg": cfg}


def replay_track(track: str, data_path: pathlib.Path, cfg, map_path) -> dict:
    from acmpc_tpu.localise.benchmarking import BenchmarkLocalisation

    bench = BenchmarkLocalisation(
        str(data_path),
        str(map_path),
        dataclasses.replace(
            cfg.localisation, collect_benchmark_observations=False
        ),
        vehicle=cfg.vehicle,
        seed=0,
    )
    s = bench.run()
    return {
        "percent_localised": round(s["percent_localised"], 1),
        "mean_position_error_m": round(s["mean_position_error_m"], 3),
        "mean_rotation_error_deg": round(s["mean_rotation_error_deg"], 3),
        "n_steps": s["n_steps"],
        "n_observations": s["n_observations"],
        "n_resets": s["n_resets"],
        "step_p50_ms": round(s["step_p50_ms"], 2),
        "observation_p50_ms": round(s["observation_p50_ms"], 2),
    }


def main():
    # honour JAX_PLATFORMS=cpu via the config API (this image's
    # sitecustomize preregisters the TPU-tunnel platform; the env var
    # alone wedges on a dead tunnel)
    import os

    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        import jax

        jax.config.update("jax_platforms", "cpu")

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--tracks", nargs="+", default=["monza", "nordschleife"]
    )
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--out", default=str(ROOT / "LOCBENCH.json"))
    ap.add_argument(
        "--replay-only",
        action="store_true",
        help="skip recording; replay the COMMITTED recordings under "
        "data/localisation/<track>_synth/racing (reproduces the shipped "
        "LOCBENCH.json numbers exactly: replay seeds are fixed)",
    )
    args = ap.parse_args()

    results = {}
    for track in args.tracks:
        data_path = ROOT / "data" / "localisation" / f"{track}_synth" / "racing"
        if args.replay_only:
            assert (data_path / "control.npy").exists(), (
                f"no committed recording for {track}"
            )
            from acmpc_tpu.config import load_config

            cfg = load_config(ROOT / "configs" / f"{track}.yaml")
            rec = {
                "map_path": str(ROOT / "data" / "maps" / f"{track}.npz"),
                "cfg": cfg,
            }
        else:
            data_path.mkdir(parents=True, exist_ok=True)
            print(f"[{track}] recording {args.steps} sim steps ...", flush=True)
            rec = record_track(track, args.steps, data_path)
        print(f"[{track}] replaying through the production filter ...", flush=True)
        results[track] = replay_track(
            track, data_path, rec["cfg"], rec["map_path"]
        )
        print(f"[{track}] {json.dumps(results[track])}", flush=True)

    out = {
        "metrics": "reference benchmark_localisation.py:17-25 triple",
        "recording": "synthetic sim, oracle perception, production "
        "500-particle filter (tools/record_locbench.py)",
        "tracks": results,
    }
    pathlib.Path(args.out).write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
