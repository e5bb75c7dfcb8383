"""Device-mesh scenario parallelism.

The reference has no multi-device story — its only parallelism is four
free-running OS processes over shared memory (SURVEY.md §2.4). The TPU
framework's scaling axis is the *scenario batch*: thousands of perturbed
initial states / vehicle params / track windows solved per control step
(BASELINE.json configs 2, 3, 5). This module shards that batch over a
`jax.sharding.Mesh`:

* ``dp`` (data/scenario) axis: each chip solves its slice of scenarios —
  zero-communication in the solve itself;
* cross-chip collectives (`psum` over ``dp``) aggregate fleet-level
  diagnostics (solved counts, worst-case residuals) so the host reads one
  scalar instead of gathering the batch;
* layouts put the scenario axis outermost so per-chip slabs are contiguous
  and ICI traffic is only the few-byte diagnostic reduction.

Works identically on 1 real TPU, N-chip slices, and the virtual CPU mesh
used in tests (conftest forces 8 host devices).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.6 exposes shard_map at the top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from acmpc_tpu.mpc.spatial_mpc import SpatialMPC


def make_mesh(n_devices: int | None = None, axis_name: str = "dp") -> Mesh:
    """1-D scenario mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def scenario_sharding(mesh: Mesh, axis_name: str = "dp") -> NamedSharding:
    """Sharding that splits the leading (scenario) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def sharded_get_control(mpc: SpatialMPC, mesh: Mesh, axis_name: str = "dp"):
    """Build a jitted, mesh-sharded scenario-batch MPC step.

    Returns ``step(states, refs) -> (states', fleet_diags)`` where the
    scenario axis of every input/output is sharded over ``axis_name`` and
    ``fleet_diags`` is a replicated dict of psum/pmax-reduced scalars.
    """

    def local_step(states, refs):
        # shard_map hands each device its local slab; vmap over it.
        new_states, diags = jax.vmap(mpc.get_control)(states, refs)
        n_solved = jax.lax.psum(
            jnp.sum(new_states.solved.astype(jnp.int32)), axis_name
        )
        worst_r_prim = jax.lax.pmax(jnp.max(diags.r_prim), axis_name)
        worst_infeas = jax.lax.pmax(
            jnp.max(new_states.infeasibility_counter), axis_name
        )
        fleet = {
            "n_solved": n_solved,
            "worst_r_prim": worst_r_prim,
            "worst_infeasibility_counter": worst_infeas,
        }
        return new_states, fleet

    spec = P(axis_name)
    rep = P()
    mapped = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=(spec, rep),
        check_vma=False,
    )
    return jax.jit(mapped)


def replicate_state(mpc: SpatialMPC, batch: int):
    """Batch of initial MPC states (host-side convenience)."""
    return jax.vmap(lambda: mpc.initial_state(), axis_size=batch)()
