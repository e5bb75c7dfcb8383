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

    # repeated calls reuse the SAME jitted wrapper (no per-call retrace)
    before = mt._jitted_step._cache_size()
    out2, _ = mt.get_control(states, refs, v_max_runtime=v_caps)
    assert mt._jitted_step._cache_size() == before
    np.testing.assert_array_equal(
        np.asarray(out2.projected_control), np.asarray(out.projected_control)
    )

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


def _build_mt():
    agent_cfgs = [load_config(CONFIG_DIR / f"{t}.yaml") for t in TRACKS]
    configs = [
        dataclasses.replace(c.racing_control, horizon=HORIZON)
        for c in agent_cfgs
    ]
    model = SpatialBicycleModel(
        vehicle=agent_cfgs[0].vehicle,
        min_velocity=configs[0].constraints.v_min,
        max_velocity=configs[0].constraints.v_max,
    )
    template = SpatialMPC(configs[0], model)
    return MultiTrackMPC(template, configs), configs


def test_track_by_scenario_grid_matches_single_axis():
    """BASELINE config 2 at scale: an (S, T) grid solve equals S separate
    track-axis solves."""
    mt, configs = _build_mt()
    S = 3
    refs = jnp.stack(
        [
            jnp.stack(
                [
                    jnp.asarray(
                        with_widths(
                            get_hairpin_track(40.0 + 5 * t + 2 * s, HORIZON)
                        ),
                        jnp.float32,
                    )
                    for t in range(len(TRACKS))
                ]
            )
            for s in range(S)
        ]
    )
    v_caps = jnp.asarray(
        [min(30.0, c.unlocalised_max_speed or 30.0) for c in configs],
        jnp.float32,
    )
    v_grid = jnp.broadcast_to(v_caps, (S, len(TRACKS)))
    states = mt.initial_states(n_scenarios=S)
    out, _ = mt.get_control_grid(states, refs, v_grid)
    assert int(out.solved.sum()) == S * len(TRACKS)

    for s in range(S):
        row, _ = mt.get_control(
            mt.initial_states(), refs[s], v_max_runtime=v_caps
        )
        np.testing.assert_allclose(
            np.asarray(out.projected_control[s]),
            np.asarray(row.projected_control),
            rtol=1e-5,
            atol=1e-5,
        )


def test_track_by_scenario_grid_sharded_over_mesh():
    """The (S, T) grid composes with shard_map over the scenario axis:
    sharded solve == single-device grid solve (8 virtual CPU devices)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from acmpc_tpu.parallel.mesh import make_mesh, shard_map

    mt, configs = _build_mt()
    S = 8
    mesh = make_mesh(8)
    refs = jnp.stack(
        [
            jnp.stack(
                [
                    jnp.asarray(
                        with_widths(
                            get_hairpin_track(40.0 + 5 * t + s, HORIZON)
                        ),
                        jnp.float32,
                    )
                    for t in range(len(TRACKS))
                ]
            )
            for s in range(S)
        ]
    )
    v_caps = jnp.asarray(
        [min(30.0, c.unlocalised_max_speed or 30.0) for c in configs],
        jnp.float32,
    )
    v_grid = jnp.broadcast_to(v_caps, (S, len(TRACKS)))
    states = mt.initial_states(n_scenarios=S)

    ref_out, _ = mt.get_control_grid(states, refs, v_grid)

    def local(states, refs, v):
        return mt._jitted_grid_step.__wrapped__(states, refs, mt.params, v)

    spec = P("dp")
    sharded = jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(spec, spec, spec),
            out_specs=spec,
            check_vma=False,
        )
    )
    states_sh = jax.device_put(states, NamedSharding(mesh, P("dp")))
    out, _ = sharded(states_sh, refs, v_grid)
    assert int(out.solved.sum()) == S * len(TRACKS)
    # Per-shard programs fuse differently than the full-batch program, so
    # the fp32 ADMM iterate trajectories diverge within solver tolerance
    # (eps_abs/eps_rel = 1e-3) — compare at that scale, not bitwise.
    np.testing.assert_allclose(
        np.asarray(out.projected_control),
        np.asarray(ref_out.projected_control),
        rtol=1e-3,
        atol=2e-3,
    )
