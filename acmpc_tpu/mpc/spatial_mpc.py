"""Spatial MPC: the fused waypoints -> speed QP -> linearise -> control QP
-> command-extraction pipeline.

TPU-native counterpart of the reference's SpatialMPC
(/root/reference/src/acmpc/control/spatial_mpc.py:20-217). Where the
reference mutates a stateful object per solve on one CPU core, this version
is a pure function ``(MPCState, inputs) -> MPCState`` so that:

* the entire control step is ONE jitted XLA program — no Python between
  the speed QP, the linearisation and the control QP;
* scenario batches (`vmap`) and device meshes (`shard_map`) apply to the
  whole step, not to individual kernels;
* the reference's infeasibility semantics (keep serving the previous
  command trajectory, count failures — spatial_mpc.py:213-217) become a
  `jnp.where` on the carried state, preserving behaviour under jit.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from flax import struct

from acmpc_tpu.dynamics.spatial_bicycle import (
    SpatialBicycleModel,
    s2t,
    t2s,
)
from acmpc_tpu.geometry.path import ReferencePath, construct_waypoints
from acmpc_tpu.mpc.control_qp import solve_control_qp
from acmpc_tpu.qp.admm import ADMMConfig
from acmpc_tpu.qp.speed_profile import (
    SpeedProfileConstraints,
    solve_speed_profile,
)

# Iteration caps mirror the reference (spatial_mpc.py:16-17)
MAX_SOLVER_ITERATIONS_MAP = 40000
MAX_SOLVER_ITERATIONS = 4000


@dataclasses.dataclass(frozen=True)
class MPCConfig:
    """Static per-mode control configuration (racing.control /
    mapping.control blocks of the reference track YAMLs)."""

    horizon: int
    step_cost: tuple  # (e_y, e_psi, t)
    r_term: tuple  # (velocity, steering)
    final_cost: tuple  # (e_y, e_psi, t)
    constraints: SpeedProfileConstraints
    unlocalised_max_speed: float | None = None
    max_iterations: int = MAX_SOLVER_ITERATIONS
    # real-time-iteration mode: run EXACTLY this many ADMM iterations per
    # solve (constant step time, warm starts carry progress; commands
    # only accepted when the end-of-budget residual check passes)
    rti_iterations: int | None = None

    @classmethod
    def from_config(cls, cfg: dict) -> "MPCConfig":
        return cls(
            horizon=cfg["horizon"],
            step_cost=tuple(cfg["step_cost"]),
            r_term=tuple(cfg["r_term"]),
            final_cost=tuple(cfg["final_cost"]),
            constraints=SpeedProfileConstraints.from_config(
                cfg["speed_profile_constraints"]
            ),
            unlocalised_max_speed=cfg.get("unlocalised_max_speed"),
        )


@struct.dataclass
class MPCState:
    """Carried solve state — what the reference keeps as object attributes
    across ControlProcess iterations."""

    projected_control: jnp.ndarray  # (2, H-1): [velocities; deltas]
    cum_time: jnp.ndarray  # (H-1,) cumulative time along the horizon
    prediction: jnp.ndarray  # (H-1, 2) predicted xy
    velocities: jnp.ndarray  # (H-1,) last speed profile (warm start)
    qp_x: jnp.ndarray  # (n_var,) control-QP primal warm start
    qp_y: jnp.ndarray  # (n_con,) control-QP dual warm start
    infeasibility_counter: jnp.ndarray  # int32
    solved: jnp.ndarray  # bool: last solve succeeded


@struct.dataclass
class MPCDiagnostics:
    speed_status: jnp.ndarray
    speed_iterations: jnp.ndarray
    control_status: jnp.ndarray
    control_iterations: jnp.ndarray
    r_prim: jnp.ndarray
    r_dual: jnp.ndarray


def shift_warm_start(state: MPCState, k, horizon: int) -> MPCState:
    """Advance the carried QP warm start by ``k`` reference stages.

    Between control steps the reference window slides along the track
    with the car, so stage j of the NEW problem corresponds to stage
    j + k of the previous solution. Re-using the raw iterates misaligns
    every variable by k stages and ADMM burns its budget undoing that;
    rolling them (repeating the terminal stage into the vacated tail) is
    the standard real-time-iteration initialisation. ``k`` may be traced
    (computed per scenario from map indices). Applies to the QP primal/
    dual iterates and the speed-profile warm start; the published
    command/prediction outputs are left untouched.
    """
    from acmpc_tpu.mpc.control_qp import NU as nu, NX as nx

    n = horizon - 1

    def roll_stages(flat, width, n_stages):
        rows = flat.reshape(n_stages, width)
        rolled = jnp.roll(rows, -k, axis=0)
        # vacated tail keeps the terminal stage's values
        idx = jnp.arange(n_stages)
        keep = idx < (n_stages - k)
        return jnp.where(keep[:, None], rolled, rows[-1][None, :]).reshape(-1)

    x_states = roll_stages(state.qp_x[: nx * (n + 1)], nx, n + 1)
    x_inputs = roll_stages(state.qp_x[nx * (n + 1) :], nu, n)
    y_eq = roll_stages(state.qp_y[: nx * (n + 1)], nx, n + 1)
    y_box_states = roll_stages(
        state.qp_y[nx * (n + 1) : 2 * nx * (n + 1)], nx, n + 1
    )
    y_box_inputs = roll_stages(state.qp_y[2 * nx * (n + 1) :], nu, n)
    vels = roll_stages(state.velocities, 1, n)
    return state.replace(
        qp_x=jnp.concatenate([x_states, x_inputs]),
        qp_y=jnp.concatenate([y_eq, y_box_states, y_box_inputs]),
        velocities=vels,
    )


class SpatialMPC:
    """Functional MPC. Construct once per (config, model); call
    :meth:`get_control` inside jit/vmap/shard_map."""

    def __init__(
        self,
        config: MPCConfig,
        model: SpatialBicycleModel,
        dtype=jnp.float32,
    ):
        self.config = config
        self.model = model
        self.dtype = dtype
        self.nx = 3
        self.nu = 2
        # Fixed rho + shorter Ruiz: the warm-started MPC problem family
        # converges in ~25 iterations without adaptation, and dropping the
        # in-loop refactorisation saves ~40% step latency on TPU (the
        # generic solver default keeps adaptive rho for robustness).
        self.admm = ADMMConfig(
            max_iter=config.max_iterations,
            adaptive_rho=False,
            scaling_iters=5,
            fixed_iterations=config.rti_iterations,
        )

    @property
    def horizon(self) -> int:
        return self.config.horizon

    @property
    def delta_max(self) -> float:
        return self.model.delta_max

    def initial_state(self) -> MPCState:
        from acmpc_tpu.mpc.control_qp import control_qp_sizes

        n = self.horizon - 1
        n_var, n_con = control_qp_sizes(self.horizon)
        return MPCState(
            projected_control=jnp.zeros((2, n), self.dtype),
            cum_time=jnp.zeros((n,), self.dtype),
            prediction=jnp.zeros((n, 2), self.dtype),
            velocities=jnp.zeros((n,), self.dtype),
            qp_x=jnp.zeros((n_var,), self.dtype),
            qp_y=jnp.zeros((n_con,), self.dtype),
            infeasibility_counter=jnp.asarray(0, jnp.int32),
            solved=jnp.asarray(False),
        )

    # ------------------------------------------------------------------
    def construct_waypoints(self, waypoint_coordinates) -> ReferencePath:
        return construct_waypoints(
            jnp.asarray(waypoint_coordinates, self.dtype)
        )

    def compute_map_speed_profile(
        self,
        path: ReferencePath,
        ay_max: float,
        a_min: float,
        mesh=None,
        axis_name: str | None = None,
    ) -> ReferencePath:
        """Full-track speed profile with map-specific lateral/brake limits
        (reference spatial_mpc.py:60-87): one large banded QP over every
        map waypoint, startup-only.

        With ``mesh`` the horizon itself is sharded over the mesh axis —
        each device owns a contiguous slab of the map and the (min,+)
        block reductions combine over ICI (qp/speed_profile.py::
        solve_speed_profile_sharded; BASELINE's within-solve horizon
        parallelism). Bit-identical to the single-device solve.
        """
        constraints = dataclasses.replace(
            self.config.constraints, ay_max=ay_max, a_min=a_min
        )
        if mesh is not None:
            return self._map_speed_profile_sharded(
                path, constraints, mesh, axis_name
            )
        sol = solve_speed_profile(
            path.distances,
            path.kappas,
            constraints,
            v_max_runtime=constraints.v_max,
            localised=False,
            use_end_velocity=False,
            cfg=dataclasses.replace(
                self.admm, max_iter=MAX_SOLVER_ITERATIONS_MAP
            ),
        )
        velocities = jnp.where(
            sol.status == 1, sol.velocities, path.velocities
        )
        return path.replace(velocities=velocities)

    def _map_speed_profile_sharded(
        self, path: ReferencePath, constraints, mesh, axis_name
    ) -> ReferencePath:
        from jax.sharding import PartitionSpec as P

        from acmpc_tpu.qp.speed_profile import solve_speed_profile_sharded

        axis = axis_name or mesh.axis_names[0]
        n_dev = mesh.shape[axis]
        n = path.n_points
        pad = (-n) % n_dev
        # neutral padding after the map's end: kappa 0 gives the maximum
        # cap, so the backward pass cannot tighten real waypoints through
        # it; padded outputs are dropped
        ds = jnp.concatenate(
            [path.distances, jnp.ones((pad,), self.dtype)], axis=-1
        )
        ks = jnp.concatenate(
            [path.kappas, jnp.zeros((pad,), self.dtype)], axis=-1
        )

        spec = P(axis)
        fn = jax.jit(
            jax.shard_map(
                lambda d, k: solve_speed_profile_sharded(
                    d,
                    k,
                    constraints,
                    axis,
                    v_max_runtime=constraints.v_max,
                    localised=False,
                    use_end_velocity=False,
                ),
                mesh=mesh,
                in_specs=(spec, spec),
                out_specs=spec,
                check_vma=False,
            )
        )
        v = fn(ds, ks)[:n]
        feasible = jnp.all(v >= constraints.v_min - 1e-4)
        velocities = jnp.where(feasible, v, path.velocities)
        return path.replace(velocities=velocities)

    # ------------------------------------------------------------------
    def _prepare(
        self,
        state: MPCState,
        reference_path: jnp.ndarray,
        v_max_runtime,
        is_localised,
        offset,
    ):
        """Waypoints + speed profile + QP assembly (everything before the
        control-QP solve). Pure; vmaps cleanly for the batched path."""
        from acmpc_tpu.mpc.control_qp import assemble_control_qp

        cfgc = self.config
        path = self.construct_waypoints(reference_path)

        speed_sol = solve_speed_profile(
            path.distances,
            path.kappas,
            cfgc.constraints,
            v_max_runtime=v_max_runtime,
            localised=is_localised,
            use_end_velocity=True,
            cfg=self.admm,
            v0=state.velocities,
        )
        # On speed-QP failure the reference leaves velocities at zero and
        # lets the control QP blow up; we gate the whole step on it instead
        # (same observable behaviour: previous commands stay live).
        path = path.replace(velocities=speed_sol.velocities)

        # Initial condition: car at (offset, 0) facing +y in the BEV frame
        # (spatial_mpc.py:186-189).
        offset = jnp.asarray(offset, self.dtype)
        temporal_state = jnp.stack(
            [offset, jnp.zeros_like(offset), jnp.full_like(offset, jnp.pi / 2)],
            axis=-1,
        )
        spatial_state = t2s(path.state(0), temporal_state)

        qp = assemble_control_qp(
            path,
            spatial_state,
            self.model,
            jnp.asarray(cfgc.step_cost, self.dtype),
            jnp.asarray(cfgc.r_term, self.dtype),
            jnp.asarray(cfgc.final_cost, self.dtype),
        )
        return path, speed_sol, qp

    def get_control(
        self,
        state: MPCState,
        reference_path: jnp.ndarray,
        v_max_runtime=None,
        is_localised=False,
        offset=0.0,
    ) -> tuple[MPCState, MPCDiagnostics]:
        """One MPC solve (reference spatial_mpc.py:170-217).

        reference_path: (H, 3) array of [x, y, width] in the ego/BEV frame
        (y forward). v_max_runtime: live reference speed (traced scalar).
        Returns the updated carry (same commands as before on infeasible
        solves) plus diagnostics.
        """
        from acmpc_tpu.qp.admm import solve_box_qp

        path, speed_sol, qp = self._prepare(
            state, reference_path, v_max_runtime, is_localised, offset
        )
        control_sol = solve_box_qp(
            *qp, self.admm, x0=state.qp_x, y0=state.qp_y
        )
        return self._extract(state, path, speed_sol, control_sol)

    def _extract(self, state, path, speed_sol, control_sol):
        n = self.horizon - 1
        ok = (speed_sol.status == 1) & control_sol.solved

        # command extraction (spatial_mpc.py:193-212)
        u_flat = control_sol.x[-n * self.nu :]
        vels = u_flat[0::2]
        deltas = jnp.arctan(u_flat[1::2] * self.model.length)
        projected = jnp.stack([vels, deltas])

        states = control_sol.x[: n * self.nx].reshape(n, self.nx)
        prediction = s2t(path, states)[:2].T
        # The published clock is computed EXACTLY from the solved plan —
        # dt_k = ds_k (1 - kappa_k e_y_k) / v_k — rather than read from
        # the QP's internal time state, which is kept in the reference's
        # cost-tuning units (dimensionless unless ds == 1 m; see
        # linearise). This fixes the reference's command-selection timing
        # bug at ds != 1 m with zero linearisation error: the temporal
        # selector (runtime/commands.py) receives real seconds.
        dt = (
            path.distances
            * (1.0 - path.kappas * states[:, 0])
            / jnp.maximum(vels, 0.1)
        )
        cum_time = jnp.concatenate(
            [jnp.zeros_like(dt[:1]), jnp.cumsum(dt[:-1])]
        )

        new_state = MPCState(
            projected_control=jnp.where(ok, projected, state.projected_control),
            cum_time=jnp.where(ok, cum_time, state.cum_time),
            prediction=jnp.where(ok, prediction, state.prediction),
            velocities=jnp.where(
                speed_sol.status == 1, speed_sol.velocities, state.velocities
            ),
            # warm-start iterates for the next re-solve (OSQP keeps these
            # implicitly across problem.update() calls); reset on failure
            # so a bad basin doesn't persist
            qp_x=jnp.where(ok, control_sol.x, jnp.zeros_like(state.qp_x)),
            qp_y=jnp.where(ok, control_sol.y, jnp.zeros_like(state.qp_y)),
            infeasibility_counter=jnp.where(
                ok, 0, state.infeasibility_counter + 1
            ).astype(jnp.int32),
            solved=ok,
        )
        diags = MPCDiagnostics(
            speed_status=speed_sol.status,
            speed_iterations=speed_sol.iterations,
            control_status=control_sol.status,
            control_iterations=control_sol.iterations,
            r_prim=control_sol.r_prim,
            r_dual=control_sol.r_dual,
        )
        return new_state, diags

    # ------------------------------------------------------------------
    @functools.cached_property
    def jitted_get_control(self):
        """jit-compiled single-scenario step."""
        return jax.jit(self.get_control)

    @functools.cached_property
    def batched_get_control(self):
        """jit(vmap) over a leading scenario axis of every argument."""
        return jax.jit(jax.vmap(self.get_control))

    @functools.cached_property
    def batched_get_control_fused(self):
        """Explicitly-batched step: prepare/extract vmapped, the control
        QP solved by the fused-Pallas batched engine (qp/batched.py) —
        explicit straggler freezing plus the VMEM-resident wide-tile
        kernel (vmap now reaches the same kernel via its custom_vmap
        merge rule; this path remains for the freeze semantics).

        Signature: (states, refs, v_max (B,) | None, is_localised (B,) |
        bool) -> (new_states, diags).
        """
        from acmpc_tpu.qp.batched import solve_box_qp_batched

        def step(states, refs, v_max=None, is_localised=None):
            B = refs.shape[0]
            if v_max is None:
                v_max = jnp.full(
                    (B,), self.config.constraints.v_max, self.dtype
                )
            if is_localised is None:
                is_localised = jnp.zeros((B,), bool)
            offsets = jnp.zeros((B,), self.dtype)
            path, speed_sol, qp = jax.vmap(self._prepare)(
                states, refs, v_max, is_localised, offsets
            )
            control_sol = solve_box_qp_batched(
                *qp, self.admm, x0=states.qp_x, y0=states.qp_y
            )
            return jax.vmap(self._extract)(
                states, path, speed_sol, control_sol
            )

        return jax.jit(step)


def build_mpc(
    control_config: dict, vehicle, dtype=jnp.float32
) -> SpatialMPC:
    """Construct an MPC from a raw config dict + VehicleParams — the
    counterpart of reference controller.build_mpc (controller.py:19-29)."""
    cfg = MPCConfig.from_config(control_config)
    model = SpatialBicycleModel(
        vehicle=vehicle,
        min_velocity=cfg.constraints.v_min,
        max_velocity=cfg.constraints.v_max,
    )
    return SpatialMPC(cfg, model, dtype)
