"""Multi-host (pod-slice) execution.

The reference has no multi-machine story at all (SURVEY.md §5.8 — POSIX
shared memory only). This module provides the TPU-native one:

* ``initialize_distributed``: thin wrapper over ``jax.distributed`` for
  multi-process launch (one process per host, standard JAX runtime);
* ``make_pod_mesh``: a ("host", "chip") mesh laid out so the scenario
  batch shards over BOTH axes with per-host slabs contiguous — intra-host
  reductions ride ICI, the only DCN traffic is the few-scalar fleet
  summary;
* ``sharded_lap_sweep``: the closed-loop lap sweep (bench/lap_sweep.py)
  sharded over the mesh, with psum-reduced summaries.

Everything here also runs on the virtual CPU mesh used in CI, and on a
single chip (1x1 mesh) — the code path is identical from laptop to pod.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from acmpc_tpu.parallel.mesh import shard_map


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Initialise the JAX distributed runtime (call once per host before
    any device use). No-ops in single-process runs."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def put_global(tree, sharding: NamedSharding):
    """Place a host-global pytree onto a (possibly multi-process) mesh.

    Single-process: plain ``device_put``. Multi-process: every process
    holds the SAME global value (deterministic construction, e.g. a fixed
    PRNG key) and contributes only its addressable shards via
    ``make_array_from_callback`` — no cross-host data movement happens at
    ingest, which is the launch contract of ``cli/launch_pod.py``."""
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)

    def put_leaf(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx]
        )

    return jax.tree.map(put_leaf, tree)


def make_pod_mesh(
    hosts: Optional[int] = None, axis_names=("host", "chip")
) -> Mesh:
    """("host", "chip") mesh over all devices. On a real pod slice the
    host axis maps across processes (DCN) and chip within (ICI); on one
    host it degenerates to (1, n_devices) with identical semantics."""
    n_proc = jax.process_count()
    devices = np.asarray(jax.devices())
    hosts = hosts or max(n_proc, 1)
    per_host = len(devices) // hosts
    grid = devices[: hosts * per_host].reshape(hosts, per_host)
    return Mesh(grid, axis_names)


def grid_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading scenario axis over every mesh axis jointly."""
    return NamedSharding(mesh, P(mesh.axis_names))


def sharded_lap_sweep(sweep, mesh: Mesh, n_steps: int):
    """Mesh-sharded closed-loop sweep: scenarios split over
    (host, chip); per-device scan+vmap; cross-device psum summary.

    Returns ``run(grid) -> (metrics_sharded, fleet_summary)`` where the
    fleet summary is replicated scalars (total solves succeeded, worst
    off-track, mean speed) — the only cross-host communication.
    """
    axes = mesh.axis_names

    def local_run(grid):
        def scenario(grid_row):
            car = sweep._init_car(grid_row)
            mpc_state = sweep.mpc.initial_state()
            _, i0 = sweep._ego_window(car)

            def body(carry, _):
                return sweep._step_one(carry, grid_row.v_max)

            (car, mpc_state, _), metrics = jax.lax.scan(
                body, (car, mpc_state, i0), None, length=n_steps
            )
            return metrics

        metrics = jax.vmap(scenario)(grid)
        n_local = metrics["v"].shape[0] * n_steps
        fleet = {
            "n_solved": jax.lax.psum(
                jnp.sum(metrics["solved"].astype(jnp.int32)), axes
            ),
            "n_solves": jax.lax.psum(jnp.asarray(n_local), axes),
            "worst_offtrack": jax.lax.pmax(
                jnp.max(metrics["offtrack"]), axes
            ),
            "mean_speed": jax.lax.pmean(jnp.mean(metrics["v"]), axes),
        }
        return metrics, fleet

    spec = P(axes)
    mapped = shard_map(
        local_run,
        mesh=mesh,
        in_specs=(spec,),
        out_specs=(spec, P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def sharded_full_lap(sweep, mesh: Mesh, max_steps: int, dt: float):
    """Pod-sharded FULL-LAP endurance sweep (BASELINE config 5's
    "nordschleife full-lap pod sweep ... across N>=2 hosts"): every
    scenario drives sequentially to lap completion (or ``max_steps``),
    scenarios sharded over the ("host", "chip") mesh.

    Unlike ``tools/full_lap.py``'s host loop, lap progress is tracked
    DEVICE-SIDE inside the scan carry (map-index deltas along the
    reference polyline x spacing), so the whole endurance run is one
    XLA program per shard and the only cross-host traffic is the final
    psum'd fleet summary. Returns ``run(grid) -> fleet`` of replicated
    scalars; lap times are ``lap_steps * dt``.
    """
    axes = mesh.axis_names
    centre = sweep._centre
    m = centre.shape[0]
    lap_len = jnp.sum(
        jnp.linalg.norm(jnp.roll(centre, -1, axis=0) - centre, axis=-1)
    )
    spacing = lap_len / m

    def local_run(grid):
        def scenario(grid_row):
            car = sweep._init_car(grid_row)
            mpc_state = sweep.mpc.initial_state()
            _, i0 = sweep._ego_window(car)

            def body(carry, step_idx):
                inner, progress, lap_step = carry
                prev_i0 = inner[2]
                inner, metrics = sweep._step_one(inner, grid_row.v_max)
                delta = jnp.mod(inner[2] - prev_i0, m)
                # windows only move forward; large residual = wrap noise
                delta = jnp.where(delta > m // 2, 0, delta)
                progress = progress + delta * spacing
                lap_step = jnp.where(
                    (lap_step < 0) & (progress >= lap_len),
                    step_idx + 1,
                    lap_step,
                )
                out = {
                    "solved": metrics["solved"],
                    "control_status": metrics["control_status"],
                    "offtrack": metrics["offtrack"],
                    "v": metrics["v"],
                }
                return (inner, progress, lap_step), out

            carry0 = (
                (car, mpc_state, i0),
                jnp.asarray(0.0, centre.dtype),
                jnp.asarray(-1, jnp.int32),
            )
            (_, progress, lap_step), metrics = jax.lax.scan(
                body, carry0, jnp.arange(max_steps)
            )
            return progress, lap_step, metrics

        progress, lap_step, metrics = jax.vmap(scenario)(grid)
        n_scen_local = lap_step.shape[0]
        done = lap_step > 0
        solved = metrics["solved"].astype(jnp.int32)
        unsolved = 1 - solved
        status = metrics["control_status"]
        big = jnp.asarray(jnp.iinfo(jnp.int32).max, jnp.int32)
        fleet = {
            "n_scenarios": jax.lax.psum(jnp.asarray(n_scen_local), axes),
            "n_solves": jax.lax.psum(
                jnp.asarray(n_scen_local * max_steps), axes
            ),
            "n_solved": jax.lax.psum(jnp.sum(solved), axes),
            "completed_laps": jax.lax.psum(
                jnp.sum(done.astype(jnp.int32)), axes
            ),
            "lap_steps_sum": jax.lax.psum(
                jnp.sum(jnp.where(done, lap_step, 0)), axes
            ),
            "lap_steps_min": jax.lax.pmin(
                jnp.min(jnp.where(done, lap_step, big)), axes
            ),
            "worst_offtrack": jax.lax.pmax(jnp.max(metrics["offtrack"]), axes),
            "mean_speed": jax.lax.pmean(jnp.mean(metrics["v"]), axes),
            # QP status histogram (admm.py): 0 = iteration budget,
            # 2 = primal infeasibility certificate
            "fail_max_iter": jax.lax.psum(
                jnp.sum(unsolved * (status == 0).astype(jnp.int32)), axes
            ),
            "fail_infeasible": jax.lax.psum(
                jnp.sum(unsolved * (status == 2).astype(jnp.int32)), axes
            ),
        }
        return fleet

    mapped = shard_map(
        local_run,
        mesh=mesh,
        in_specs=(P(axes),),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(mapped)
