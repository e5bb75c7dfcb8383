"""Generate golden control-sequence fixtures for regression testing.

For every shipped track config, solve the racing MPC on a deterministic
battery of synthetic windows (hairpin/chicane/curve/straight — the same
families the reference's test harness exercises,
/root/reference/src/acmpc/tests/test_spatial_mpc.py:15-136) and record
the projected control sequences. tests/test_golden.py replays them; any
numerical drift in the solve pipeline shows up as a diff against these
fixtures. Regenerate deliberately with: python tools/gen_golden.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def battery(horizon: int):
    from acmpc_tpu.geometry.tracks import (
        get_chicane_track,
        get_curved_track,
        get_hairpin_track,
        get_straight_track,
        with_widths,
    )

    return {
        "hairpin_r30": with_widths(get_hairpin_track(30.0, horizon)),
        "hairpin_r60": with_widths(get_hairpin_track(60.0, horizon)),
        "chicane": with_widths(get_chicane_track(40.0, 10.0, horizon)),
        "curve": with_widths(get_curved_track(0.002, horizon, angle=-np.pi / 2)),
        "straight": with_widths(get_straight_track(200.0, horizon)),
    }


TRACKS = [
    "monza", "spa", "silverstone", "nordschleife",
    "vallelunga", "bathurst", "yas_marina",
]
# the SHIPPED racing operating point (configs/*.yaml racing horizon) —
# the fast regression guard must cover what production runs
HORIZON = 50


def main():
    import jax.numpy as jnp

    from acmpc_tpu.config import load_config
    from acmpc_tpu.dynamics import SpatialBicycleModel
    from acmpc_tpu.mpc.spatial_mpc import SpatialMPC
    import dataclasses

    root = pathlib.Path(__file__).resolve().parent.parent
    out = {}
    windows = battery(HORIZON)
    for track in TRACKS:
        cfg = load_config(root / "configs" / f"{track}.yaml")
        control = dataclasses.replace(cfg.racing_control, horizon=HORIZON)
        model = SpatialBicycleModel(
            vehicle=cfg.vehicle,
            min_velocity=control.constraints.v_min,
            max_velocity=control.constraints.v_max,
        )
        mpc = SpatialMPC(control, model)
        v_cap = min(30.0, control.unlocalised_max_speed or 30.0)
        for name, ref in windows.items():
            state, diags = mpc.jitted_get_control(
                mpc.initial_state(),
                jnp.asarray(ref, jnp.float32),
                jnp.float32(v_cap),
            )
            key = f"{track}/{name}"
            out[f"{key}/solved"] = np.asarray(state.solved)
            out[f"{key}/projected_control"] = np.asarray(
                state.projected_control
            )
            out[f"{key}/cum_time"] = np.asarray(state.cum_time)
            print(key, "solved:", bool(state.solved))
    for key, val in multi_track_golden(root).items():
        out[key] = val
    path = root / "tests" / "fixtures" / "golden_controls.npz"
    path.parent.mkdir(exist_ok=True)
    np.savez_compressed(path, **out)
    print("wrote", path)


def multi_track_golden(root) -> dict:
    """One batched 7-track MultiTrackMPC solve (per-track params packed,
    hairpin radius varying per track) — the track-parallel program's own
    regression fixture."""
    import dataclasses

    import jax.numpy as jnp

    from acmpc_tpu.config import load_config
    from acmpc_tpu.dynamics import SpatialBicycleModel
    from acmpc_tpu.geometry.tracks import get_hairpin_track, with_widths
    from acmpc_tpu.mpc.multi_track import MultiTrackMPC
    from acmpc_tpu.mpc.spatial_mpc import SpatialMPC

    agent_cfgs = [load_config(root / "configs" / f"{t}.yaml") for t in TRACKS]
    configs = [
        dataclasses.replace(c.racing_control, horizon=HORIZON)
        for c in agent_cfgs
    ]
    model = SpatialBicycleModel(
        vehicle=agent_cfgs[0].vehicle,
        min_velocity=configs[0].constraints.v_min,
        max_velocity=configs[0].constraints.v_max,
    )
    mt = MultiTrackMPC(SpatialMPC(configs[0], model), configs)
    refs = jnp.stack(
        [
            jnp.asarray(
                with_widths(get_hairpin_track(40.0 + 5 * i, HORIZON)),
                jnp.float32,
            )
            for i in range(len(TRACKS))
        ]
    )
    v_caps = jnp.asarray(
        [min(30.0, c.unlocalised_max_speed or 30.0) for c in configs],
        jnp.float32,
    )
    out, _ = mt.get_control(mt.initial_states(), refs, v_max_runtime=v_caps)
    print("multi_track solved:", np.asarray(out.solved).tolist())
    return {
        "multi_track/solved": np.asarray(out.solved),
        "multi_track/projected_control": np.asarray(out.projected_control),
        "multi_track/cum_time": np.asarray(out.cum_time),
    }


if __name__ == "__main__":
    main()
