"""Race CLI — the counterpart of the reference's ``python main.py
--config configs/<track>.yaml`` (/root/reference/main.py:6-15).

Without the Assetto Corsa game, the default simulator is the built-in
SyntheticSimulator over the configured track map; an external simulator
can be plugged by implementing runtime.sim.SimulatorInterface.
"""

from __future__ import annotations

import argparse


def parse_arguments():
    parser = argparse.ArgumentParser(description="Race an acmpc_tpu agent")
    parser.add_argument("--config", required=True, help="track config yaml")
    parser.add_argument(
        "--steps", type=int, default=2000, help="max simulator steps"
    )
    parser.add_argument(
        "--oracle-perception",
        action="store_true",
        help="bypass the segmentation network with the simulator's "
        "ground-truth masks (useful without trained weights)",
    )
    parser.add_argument(
        "--map", default=None, help="override the track map path"
    )
    parser.add_argument(
        "--dashboard", action="store_true", help="serve the MJPEG dashboard"
    )
    parser.add_argument(
        "--remote",
        default=None,
        metavar="HOST:PORT",
        help="drive an EXTERNAL simulator process served by "
        "`python -m acmpc_tpu.runtime.sim_bridge` instead of the "
        "in-process synthetic sim; command timing then runs on the "
        "wall clock (the real-time-game configuration)",
    )
    return parser.parse_args()


def main():
    args = parse_arguments()

    from acmpc_tpu.config import load_config
    from acmpc_tpu.localise.track_map import load_track_map
    from acmpc_tpu.perception.camera import CameraInfo
    from acmpc_tpu.runtime import Agent, SyntheticSimulator

    cfg = load_config(args.config)
    map_path = args.map or cfg.map_path
    track_map = load_track_map(map_path)
    if args.remote:
        from acmpc_tpu.runtime.sim_bridge import RemoteSimulator

        host, _, port = args.remote.rpartition(":")
        sim = RemoteSimulator(host or "127.0.0.1", int(port))
    else:
        camera = CameraInfo.from_config(cfg.perception)
        sim = SyntheticSimulator(track_map, camera)
    agent = Agent(
        cfg,
        sim,
        use_oracle_perception=args.oracle_perception,
        map_path=map_path,
    )
    dashboard = None
    if args.dashboard:
        from acmpc_tpu.dashboard import Dashboard

        dashboard = Dashboard(agent, sim)
        dashboard.start()
        print(f"dashboard: http://localhost:{dashboard.port}/")
    try:
        obs = agent.run(max_steps=args.steps)
        state = obs["state"]
        print(
            f"finished: distance={state['distance_traveled']:.0f} m, "
            f"laps={state['completed_laps']}, "
            f"speed={state['speed_kmh']:.0f} km/h"
        )
    finally:
        if dashboard is not None:
            dashboard.stop()


if __name__ == "__main__":
    main()
