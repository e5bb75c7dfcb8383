"""On-device closed-loop lap sweeps.

The BASELINE.json scaling configs — "robustness batch: 4096 perturbed
initial-state scenarios solved per control step" and "nordschleife
full-lap pod sweep: 10k+ sequential solves x parameter grid" — need a
closed loop that never leaves the device: per step, each scenario
extracts its own map window in the ego frame, runs the full MPC solve,
samples the active command and integrates the kinematic bicycle. Here
that whole step is one jitted program, `vmap`ped over the scenario grid,
`lax.scan`ned over time, and shardable over a mesh with
``parallel.sharded_get_control``-style specs — nothing like it exists in
the reference, whose loop crosses process boundaries every frame.

The per-scenario runtime knobs (start index, lateral offset, runtime
speed cap) are exactly the perturbation axes of the robustness configs.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from acmpc_tpu.geometry.path import wrap_to_pi
from acmpc_tpu.localise.track_map import TrackMap
from acmpc_tpu.mpc.spatial_mpc import SpatialMPC, shift_warm_start


@struct.dataclass
class SweepGrid:
    """Per-scenario perturbations (leading axis = scenario)."""

    start_index: jnp.ndarray  # int32 (B,)
    lateral_offset: jnp.ndarray  # (B,) metres
    v_max: jnp.ndarray  # (B,) runtime speed cap

    @classmethod
    def regular(cls, batch: int, n_map_points: int, v_max: float = 28.0):
        return cls(
            start_index=jnp.linspace(0, n_map_points - 1, batch).astype(
                jnp.int32
            ),
            lateral_offset=jnp.zeros(batch),
            v_max=jnp.full(batch, v_max),
        )

    @classmethod
    def perturbed(cls, key, batch: int, n_map_points: int, v_max: float = 28.0):
        k1, k2, k3 = jax.random.split(key, 3)
        return cls(
            start_index=jax.random.randint(k1, (batch,), 0, n_map_points),
            # clip perturbations into the drivable corridor — starts
            # outside it are unrecoverable by construction
            lateral_offset=jnp.clip(
                1.5 * jax.random.normal(k2, (batch,)), -3.0, 3.0
            ),
            v_max=v_max * jax.random.uniform(k3, (batch,), minval=0.8, maxval=1.1),
        )


@struct.dataclass
class CarState:
    x: jnp.ndarray
    y: jnp.ndarray
    yaw: jnp.ndarray
    v: jnp.ndarray


class LapSweep:
    """Closed-loop lap simulation for one (mpc, map) pair."""

    def __init__(
        self,
        mpc: SpatialMPC,
        track_map: TrackMap,
        half_width: float = 5.0,
        dt: float = 0.1,
        window_spacing: float = 2.0,
        reference_polyline: np.ndarray | None = None,
        reference_widths: np.ndarray | None = None,
        reference_speeds: np.ndarray | None = None,
    ):
        """``reference_polyline`` switches the TRACKED line away from the
        map centreline — e.g. the shipped minimum-curvature raceline
        (tools/build_assets.py); ``reference_widths`` gives the drivable
        corridor width at each of its points (the raceline hugs the
        boundaries, so the symmetric e_y corridor shrinks there). The
        off-track metric always measures against the map centreline.

        ``reference_speeds`` is the shipped per-point speed profile
        (data/racelines/*.npz "speeds"): when given, each step's runtime
        speed cap is the windowed mean of the profile around the car —
        the reference's localised map-speed lookup (its agent takes the
        mean of map speeds from index-25 to +75 on a 0.5 m map,
        reference agent.py:130-143) — and the per-window speed QP runs
        in localised mode (curvature cap dropped; map speeds already
        encode it, reference speed_profile.py:131-150)."""
        self.mpc = mpc
        self.map = track_map
        self.half_width = half_width
        self.dt = dt
        centre = np.asarray(track_map.centre)
        ref = centre if reference_polyline is None else np.asarray(reference_polyline)
        spacing = float(np.linalg.norm(np.diff(ref, axis=0), axis=1).mean())
        self.window_stride = max(1, int(round(window_spacing / spacing)))
        self._map_centre = jnp.asarray(centre, mpc.dtype)
        self._centre = jnp.asarray(ref, mpc.dtype)
        if reference_widths is None:
            widths = np.full(len(ref), 2.0 * half_width, np.float32)
        else:
            widths = np.asarray(reference_widths, np.float32)
        self._widths = jnp.asarray(widths, mpc.dtype)
        if reference_speeds is None:
            self._speeds = None
        else:
            # align the (N-1,) per-segment profile to reference points
            speeds = np.asarray(reference_speeds, np.float32)
            self._speeds = jnp.asarray(
                np.resize(speeds, len(ref)), mpc.dtype
            )
            # the reference's window is -12.5 m .. +37.5 m around the
            # car's map index (-25..+75 points on its 0.5 m map)
            self._speed_window = (
                -max(1, int(round(12.5 / spacing))),
                max(1, int(round(37.5 / spacing))),
            )

    def _runtime_v_max(self, grid_v_max, i0):
        """Per-step speed cap: the grid's cap, gated by the windowed mean
        of the shipped speed profile when one is loaded (the reference's
        reference_speed, agent.py:130-143)."""
        if self._speeds is None:
            return grid_v_max
        lo, hi = self._speed_window
        m = self._speeds.shape[0]
        idx = (i0 + jnp.arange(lo, hi)) % m
        return jnp.minimum(grid_v_max, jnp.mean(self._speeds[idx]))

    # -- per-scenario pieces --------------------------------------------
    def _init_car(self, grid: SweepGrid, i: int | None = None) -> CarState:
        centre = self._centre
        m = centre.shape[0]
        idx = grid.start_index
        p0 = centre[idx % m]
        p1 = centre[(idx + 1) % m]
        yaw = jnp.arctan2(p1[..., 1] - p0[..., 1], p1[..., 0] - p0[..., 0])
        normal = jnp.stack(
            [-jnp.sin(yaw), jnp.cos(yaw)], axis=-1
        )  # left of heading
        pos = p0 + grid.lateral_offset[..., None] * normal
        return CarState(
            x=pos[..., 0],
            y=pos[..., 1],
            yaw=yaw,
            v=jnp.full_like(yaw, 10.0),
        )

    def _ego_window(self, car: CarState):
        """Map centreline window ahead of the car, in the ego BEV frame
        (y forward) — the offline analogue of the perceived centreline."""
        centre = self._centre
        m = centre.shape[0]
        horizon = self.mpc.horizon
        pos = jnp.stack([car.x, car.y], axis=-1)
        d2 = jnp.sum((centre - pos) ** 2, axis=-1)
        i0 = jnp.argmin(d2)
        idx = (i0 + self.window_stride * jnp.arange(horizon)) % m
        world = centre[idx]
        a = -car.yaw + jnp.pi / 2
        rot = jnp.stack(
            [
                jnp.stack([jnp.cos(a), -jnp.sin(a)], -1),
                jnp.stack([jnp.sin(a), jnp.cos(a)], -1),
            ],
            -2,
        )
        bev = (world - pos) @ rot.T
        widths = self._widths[idx]
        return jnp.concatenate([bev, widths[:, None]], axis=1), i0

    def _select_command(self, mpc_state, elapsed):
        """On-device temporal command selection (commands.py:20-38)."""
        cum = mpc_state.cum_time
        dist = cum - elapsed
        i = jnp.argmin(jnp.abs(dist))
        i = jnp.where(dist[i] > 0, i - 1, i)
        i = jnp.clip(i, 0, cum.shape[0] - 1)
        v_cmd = mpc_state.projected_control[0, i]
        delta_cmd = mpc_state.projected_control[1, i]
        return v_cmd, delta_cmd

    def _integrate(self, car: CarState, mpc_state, i0):
        """Apply the active command through the kinematic car and compute
        step metrics."""
        v_cmd, delta = self._select_command(mpc_state, self.dt)
        # longitudinal response limited by the configured accel band
        c = self.mpc.config.constraints
        dv = jnp.clip(v_cmd - car.v, c.a_min * 3 * self.dt, c.a_max * 3 * self.dt)
        v = jnp.maximum(car.v + dv, 0.0)
        yaw = wrap_to_pi(
            car.yaw + v * jnp.tan(delta) / self.mpc.model.length * self.dt
        )
        car = CarState(
            x=car.x + v * jnp.cos(car.yaw) * self.dt,
            y=car.y + v * jnp.sin(car.yaw) * self.dt,
            yaw=yaw,
            v=v,
        )
        pos = jnp.stack([car.x, car.y], axis=-1)
        off = jnp.sqrt(jnp.min(jnp.sum((self._map_centre - pos) ** 2, axis=-1)))
        metrics = {
            "v": v,
            "offtrack": off,
            "solved": mpc_state.solved,
            "map_index": i0,
        }
        return car, metrics

    def _shift_stages(self, i0, prev_i0):
        """Reference stages the window advanced since the last solve.
        A nearest-index REGRESSION (the argmin slipping back a point when
        the car sits between equidistant reference points) wraps to
        delta ~ m-1 under the modulo; treat any backward-looking jump as
        no shift rather than scrambling the whole warm start."""
        m = self._centre.shape[0]
        delta = jnp.mod(i0 - prev_i0, m)
        delta = jnp.where(delta > m // 2, 0, delta)
        k = jnp.round(delta / self.window_stride).astype(jnp.int32)
        return jnp.clip(k, 0, self.mpc.horizon - 1)

    def _step_one(self, carry, grid_v_max):
        car, mpc_state, prev_i0 = carry
        ref, i0 = self._ego_window(car)
        mpc_state = shift_warm_start(
            mpc_state, self._shift_stages(i0, prev_i0), self.mpc.horizon
        )
        mpc_state, diags = self.mpc.get_control(
            mpc_state,
            ref,
            v_max_runtime=self._runtime_v_max(grid_v_max, i0),
            is_localised=self._speeds is not None,
        )
        car, metrics = self._integrate(car, mpc_state, i0)
        metrics["control_iterations"] = diags.control_iterations
        metrics["control_status"] = diags.control_status
        return (car, mpc_state, i0), metrics

    # -- public API ------------------------------------------------------
    @property
    def _fused_step(self):
        if not hasattr(self, "_fused_step_fn"):

            @jax.jit
            def step(cars, mpc_states, v_max, prev_i0):
                refs, i0 = jax.vmap(self._ego_window)(cars)
                # real-time-iteration warm start: advance the carried
                # iterates by however many stages each window slid
                mpc_states = jax.vmap(
                    lambda s, k: shift_warm_start(s, k, self.mpc.horizon)
                )(mpc_states, jax.vmap(self._shift_stages)(i0, prev_i0))
                localised = self._speeds is not None
                mpc_states, diags = self.mpc.batched_get_control_fused(
                    mpc_states,
                    refs,
                    v_max=jax.vmap(self._runtime_v_max)(v_max, i0),
                    is_localised=jnp.full(refs.shape[:1], localised),
                )
                cars, metrics = jax.vmap(self._integrate)(
                    cars, mpc_states, i0
                )
                metrics["control_iterations"] = diags.control_iterations
                metrics["control_status"] = diags.control_status
                return cars, mpc_states, metrics, i0

            self._fused_step_fn = step
        return self._fused_step_fn

    def run_fused(self, grid: SweepGrid, n_steps: int):
        """Closed-loop sweep with the whole SCENARIO BATCH inside each
        step: windows/extraction/integration vmapped, the control QP
        solved by the fused-Pallas batched engine. Steps are dispatched
        from the host rather than lax.scan'ned: empirically XLA schedules
        the identical per-step program ~10x faster as a standalone
        executable than as a scan body on this hardware, and the host
        round-trip is negligible against the 25 ms step."""
        B = grid.start_index.shape[0]
        cars = jax.vmap(self._init_car)(grid)
        mpc_states = jax.vmap(lambda _: self.mpc.initial_state())(
            jnp.arange(B)
        )
        _, prev_i0 = jax.vmap(self._ego_window)(cars)  # no shift on step 1
        per_step = []
        for _ in range(n_steps):
            cars, mpc_states, metrics, prev_i0 = self._fused_step(
                cars, mpc_states, grid.v_max, prev_i0
            )
            per_step.append(metrics)
        metrics = jax.tree.map(lambda *a: jnp.stack(a, axis=1), *per_step)
        return cars, metrics

    def run(self, grid: SweepGrid, n_steps: int):
        """Simulate ``n_steps`` of every scenario. Returns
        (final CarState, per-step metrics stacked (n_steps, B))."""

        def scenario(grid_row):
            car = self._init_car(grid_row)
            mpc_state = self.mpc.initial_state()
            _, i0 = self._ego_window(car)

            def body(carry, _):
                return self._step_one(carry, grid_row.v_max)

            (car, mpc_state, _), metrics = jax.lax.scan(
                body, (car, mpc_state, i0), None, length=n_steps
            )
            return car, metrics

        return jax.jit(jax.vmap(scenario))(grid)

    def summarise(self, metrics, n_steps: int) -> dict:
        v = np.asarray(metrics["v"])
        off = np.asarray(metrics["offtrack"])
        solved = np.asarray(metrics["solved"])
        out = {
            "scenarios": int(v.shape[0]),
            "steps": int(n_steps),
            "total_solves": int(v.shape[0] * n_steps),
            "mean_speed_ms": float(v[:, n_steps // 4 :].mean()),
            "p95_offtrack_m": float(np.percentile(off, 95)),
            "solve_success_rate": float(solved.mean()),
        }
        # Failure diagnosis (by QP status, admm.py STATUS_*): distinguish
        # genuine infeasibility certificates from iteration-budget
        # exhaustion, and whether failures are transient (scenario
        # recovers on a later step) or persistent.
        if "control_status" in metrics:
            status = np.asarray(metrics["control_status"])
            fails = ~solved.astype(bool)
            n = max(int(fails.sum()), 1)
            persistent = fails[:, -1] & (fails.sum(axis=1) > n_steps // 2)
            out.update(
                fail_max_iter_frac=float((fails & (status == 0)).sum() / n),
                fail_primal_infeasible_frac=float(
                    (fails & (status == 2)).sum() / n
                ),
                fail_persistent_scenarios=int(persistent.sum()),
            )
        # Crash split: a car outside the drivable corridor (|e_y| >
        # width/2 - vehicle margin, the control QP's box bound on e_y at
        # k>=1) makes the QP genuinely infeasible — the correct response
        # is keep-last-command (reference spatial_mpc.py behaviour), and
        # those solves should not be read as solver weakness. Report
        # failures conditioned on being inside the corridor separately.
        half_drivable = self.half_width - self.mpc.model.margin
        in_corridor = off <= half_drivable
        fails = ~solved.astype(bool)
        out.update(
            crashed_scenarios=int((~in_corridor).any(axis=1).sum()),
            in_corridor_fail_rate=float(
                (fails & in_corridor).sum() / max(in_corridor.sum(), 1)
            ),
        )
        return out
