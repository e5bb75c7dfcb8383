"""All-tracks-vectorised MPC: one batched solve across track configs.

BASELINE.json config 2: "one batched solve over monza/spa/silverstone/
bathurst/vallelunga/yas_marina/nordschleife configs". The per-track
differences (cost weights, speed-profile constraint values — SURVEY.md
§5.6) are VALUES, not structure: all racing configs share horizon 50 and
the same vehicle. So the track axis becomes a batch axis: costs and
constraints enter the jitted step as (T, ...) arrays instead of jit-time
constants, and one vmapped program solves every track's MPC at once (and
composes with a scenario axis for track x scenario grids).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from acmpc_tpu.geometry.path import construct_waypoints
from acmpc_tpu.dynamics.spatial_bicycle import t2s
from acmpc_tpu.mpc.control_qp import assemble_control_qp
from acmpc_tpu.mpc.spatial_mpc import MPCConfig, SpatialMPC
from acmpc_tpu.ops.tridiag import tridiag_solve  # noqa: F401 (re-export site)
from acmpc_tpu.qp.admm import solve_box_qp
from acmpc_tpu.qp.speed_profile import (
    SpeedProfileSolution,
    _min_plus_scan,
    STATUS_SOLVED,
    STATUS_MAX_ITER,
)


def pack_track_params(configs: list[MPCConfig]):
    """Stack per-track cost/constraint values into traced arrays.

    Returns a dict of (T, ...) arrays. ``end_velocity`` None (vallelunga)
    becomes has_end=0.
    """
    c = [cfg.constraints for cfg in configs]
    return {
        "step_cost": jnp.asarray([cfg.step_cost for cfg in configs], jnp.float32),
        "r_term": jnp.asarray([cfg.r_term for cfg in configs], jnp.float32),
        "final_cost": jnp.asarray([cfg.final_cost for cfg in configs], jnp.float32),
        "v_min": jnp.asarray([x.v_min for x in c], jnp.float32),
        "v_max": jnp.asarray([x.v_max for x in c], jnp.float32),
        "a_min": jnp.asarray([x.a_min for x in c], jnp.float32),
        "a_max": jnp.asarray([x.a_max for x in c], jnp.float32),
        "ay_max": jnp.asarray([x.ay_max for x in c], jnp.float32),
        "ki_min": jnp.asarray([x.ki_min for x in c], jnp.float32),
        "end_velocity": jnp.asarray(
            [x.end_velocity if x.end_velocity is not None else 0.0 for x in c],
            jnp.float32,
        ),
        "has_end_velocity": jnp.asarray(
            [x.end_velocity is not None for x in c], jnp.float32
        ),
    }


def _speed_profile_traced(distances, kappas, p, v_max_runtime):
    """Exact (min,+)-scan speed solve with traced constraint values
    (mirror of qp/speed_profile.solve_speed_profile with runtime
    constraints instead of jit-time constants)."""
    eps = 1e-12
    abs_k = jnp.abs(kappas)
    v_max_dyn = jnp.sqrt(p["ay_max"] / (abs_k + eps))
    v_max_dyn = jnp.where(abs_k < p["ki_min"], v_max_runtime, v_max_dyn)
    v_caps = jnp.minimum(v_max_dyn, v_max_runtime)
    v_caps = jnp.maximum(p["v_min"], v_caps) + 2.0
    end = jnp.where(p["has_end_velocity"] > 0, p["end_velocity"], v_caps[-1])
    v_hi = v_caps.at[-1].set(end)

    n = kappas.shape[-1]
    d = distances[..., : n - 1]
    forward = _min_plus_scan(v_hi, 2.0 * d * p["a_max"])
    backward = jnp.flip(
        _min_plus_scan(jnp.flip(v_hi, -1), jnp.flip(-2.0 * d * p["a_min"], -1)),
        -1,
    )
    v = jnp.minimum(forward, backward)
    feasible = jnp.all(v >= p["v_min"] - 1e-4)
    status = jnp.where(feasible, STATUS_SOLVED, STATUS_MAX_ITER)
    zero = jnp.zeros((), distances.dtype)
    return SpeedProfileSolution(
        velocities=v,
        status=status,
        iterations=jnp.asarray(0, jnp.int32),
        r_prim=zero,
        r_dual=zero,
    )


class MultiTrackMPC:
    """One SpatialMPC template (shared horizon + vehicle) solving a batch
    of per-track parameterisations in a single jitted program."""

    def __init__(self, template: SpatialMPC, configs: list[MPCConfig]):
        horizons = {cfg.horizon for cfg in configs}
        assert horizons == {template.horizon}, (
            f"all tracks must share the template horizon, got {horizons}"
        )
        self.mpc = template
        self.params = pack_track_params(configs)
        self.n_tracks = len(configs)

    def _one(self, state, ref, p, v_max_runtime):
        mpc = self.mpc
        path = construct_waypoints(jnp.asarray(ref, mpc.dtype))
        speed_sol = _speed_profile_traced(
            path.distances, path.kappas, p, v_max_runtime
        )
        path = path.replace(velocities=speed_sol.velocities)
        temporal = jnp.asarray([0.0, 0.0, jnp.pi / 2], mpc.dtype)
        spatial_state = t2s(path.state(0), temporal)
        kappa_max = mpc.model.kappa_max
        qp = assemble_control_qp(
            path,
            spatial_state,
            mpc.model,
            p["step_cost"],
            p["r_term"],
            p["final_cost"],
            u_min=jnp.stack([p["v_min"], jnp.asarray(-kappa_max)]),
            u_max=jnp.stack([p["v_max"], jnp.asarray(kappa_max)]),
        )
        sol = solve_box_qp(*qp, mpc.admm, x0=state.qp_x, y0=state.qp_y)
        return mpc._extract(state, path, speed_sol, sol)

    @functools.cached_property
    def _jitted_step(self):
        """jit(vmap) over the track axis, built ONCE — constructing a new
        jit wrapper per call would defeat the trace cache and recompile
        every invocation."""
        return jax.jit(jax.vmap(self._one))

    @functools.cached_property
    def _jitted_grid_step(self):
        """jit(vmap(vmap)) over (scenario, track): the outer axis maps
        states/refs/v_max, the track-parameter pytree broadcasts."""
        inner = jax.vmap(self._one)  # track axis: maps everything
        outer = jax.vmap(inner, in_axes=(0, 0, None, 0))  # scenario axis
        return jax.jit(outer)

    def get_control(self, states, refs, v_max_runtime=None):
        """states/refs batched over the track axis; v_max (T,) or None."""
        if v_max_runtime is None:
            v_max_runtime = self.params["v_max"]
        return self._jitted_step(states, refs, self.params, v_max_runtime)

    def get_control_grid(self, states, refs, v_max_runtime=None):
        """Track x scenario grid solve (BASELINE config 2 at scale).

        states/refs lead with (S, T, ...); v_max (S, T) or None. One jitted
        program; compose with shard_map over the scenario axis for meshes.
        """
        S = refs.shape[0]
        if v_max_runtime is None:
            v_max_runtime = jnp.broadcast_to(self.params["v_max"], (S, self.n_tracks))
        return self._jitted_grid_step(states, refs, self.params, v_max_runtime)

    def initial_states(self, n_scenarios: int | None = None):
        states = jax.vmap(lambda _: self.mpc.initial_state())(
            jnp.arange(self.n_tracks)
        )
        if n_scenarios is None:
            return states
        return jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (n_scenarios, *x.shape)), states
        )
