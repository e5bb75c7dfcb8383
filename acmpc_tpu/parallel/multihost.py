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
