"""All-7-tracks vectorised solve (BASELINE config 2): one batched program
across every shipped racing config, verified per-track against the
per-config jit path."""

import dataclasses
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

from acmpc_tpu.config import load_config
from acmpc_tpu.dynamics import SpatialBicycleModel
from acmpc_tpu.geometry.tracks import get_hairpin_track, with_widths
from acmpc_tpu.mpc.multi_track import MultiTrackMPC
from acmpc_tpu.mpc.spatial_mpc import SpatialMPC

CONFIG_DIR = pathlib.Path(__file__).resolve().parent.parent / "configs"
TRACKS = [
    "monza", "spa", "silverstone", "nordschleife",
    "vallelunga", "bathurst", "yas_marina",
]
HORIZON = 16  # shrunk from 50 for test speed; values stay per-track


def test_all_seven_tracks_one_batched_solve():
    agent_cfgs = [load_config(CONFIG_DIR / f"{t}.yaml") for t in TRACKS]
    configs = [
        dataclasses.replace(c.racing_control, horizon=HORIZON)
        for c in agent_cfgs
    ]
    template_model = SpatialBicycleModel(
        vehicle=agent_cfgs[0].vehicle,
        min_velocity=configs[0].constraints.v_min,
        max_velocity=configs[0].constraints.v_max,
    )
    template = SpatialMPC(configs[0], template_model)
    mt = MultiTrackMPC(template, configs)

    refs = jnp.stack(
        [
            jnp.asarray(
                with_widths(get_hairpin_track(40.0 + 5 * i, HORIZON)),
                jnp.float32,
            )
            for i in range(len(TRACKS))
        ]
    )
    # cap the runtime speed so every track's window is dynamically feasible
    v_caps = jnp.asarray(
        [min(30.0, c.unlocalised_max_speed or 30.0) for c in configs],
        jnp.float32,
    )
    states = mt.initial_states()
    out, diags = mt.get_control(states, refs, v_max_runtime=v_caps)
    assert int(out.solved.sum()) == len(TRACKS), np.asarray(diags.r_prim)

    # per-track parity: the batched solve equals each track's own MPC
    for i, cfg in enumerate(configs):
        model = SpatialBicycleModel(
            vehicle=agent_cfgs[i].vehicle,
            min_velocity=cfg.constraints.v_min,
            max_velocity=cfg.constraints.v_max,
        )
        single = SpatialMPC(cfg, model)
        s_out, _ = jax.jit(single.get_control)(
            single.initial_state(), refs[i], v_caps[i]
        )
        assert bool(s_out.solved)
        np.testing.assert_allclose(
            np.asarray(out.projected_control[i]),
            np.asarray(s_out.projected_control),
            rtol=5e-3,
            atol=5e-3,
            err_msg=f"track {TRACKS[i]}",
        )
