"""Distributed tridiagonal solve over a device-mesh axis (SPIKE).

This is the "per-block QP reduction combined via ICI collectives" named
in BASELINE.md / SURVEY.md §5.7: the map-scale speed-profile QP's ADMM
x-update is one symmetric diagonally-dominant tridiagonal system over
every map waypoint (~10^4-10^5 unknowns). Within a chip we solve it with
parallel cyclic reduction (ops/tridiag.py); across chips each device owns
a contiguous slab of rows and we use the SPIKE / substructuring scheme:

  1. per-block reduction — each device solves its local tridiagonal
     block against THREE right-hand sides (the rhs slab and the two
     coupling columns into its neighbours) with the in-chip PCR solver;
     this collapses the slab to 2 interface unknowns;
  2. ICI combine — one `all_gather` of 6 scalars per device builds the
     (2S x 2S) interface system, solved REPLICATED on every device
     (S = devices on the axis; the system is tiny and dense);
  3. local back-substitution — x_local = y + v*x_left + w*x_right, pure
     elementwise.

Total ICI traffic: 6 floats per device per solve, independent of N.
Stable for the diagonally dominant systems the QP engine produces (the
coupling spikes v, w decay geometrically, so the interface system
inherits the dominance).

Runs INSIDE `shard_map` over a 1-D mesh axis; supports arbitrary leading
batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from acmpc_tpu.ops.tridiag import tridiag_solve


def tridiag_solve_sharded(
    sub: jnp.ndarray,
    diag: jnp.ndarray,
    sup: jnp.ndarray,
    rhs: jnp.ndarray,
    axis_name: str,
) -> jnp.ndarray:
    """Solve the GLOBAL tridiagonal system whose rows are sharded as
    contiguous slabs over ``axis_name``.

    Local shapes are (..., M). Conventions match ops/tridiag.py row-wise:
    ``sub[..., 0]`` is this slab's coupling to the LAST row of the
    previous slab (ignored on the first device), ``sup[..., -1]`` the
    coupling to the FIRST row of the next slab (ignored on the last).
    """
    idx = jax.lax.axis_index(axis_name)
    dtype = rhs.dtype
    m = rhs.shape[-1]

    # couplings to the neighbours; a gather below tells us the axis size,
    # so mask the last device's coupling afterwards via its w column
    a0 = jnp.where(idx == 0, 0.0, sub[..., 0]).astype(dtype)
    cm = sup[..., -1].astype(dtype)  # masked for the last device below

    # 1. per-block reduction: one batched PCR solve, three RHS
    sub_in = sub.at[..., 0].set(0.0)
    sup_in = sup.at[..., -1].set(0.0)
    e0 = jnp.zeros_like(rhs).at[..., 0].set(1.0)
    em = jnp.zeros_like(rhs).at[..., -1].set(1.0)
    rhs3 = jnp.stack([rhs, -a0[..., None] * e0, -cm[..., None] * em], axis=0)
    y3 = tridiag_solve(
        jnp.broadcast_to(sub_in, rhs3.shape),
        jnp.broadcast_to(diag, rhs3.shape),
        jnp.broadcast_to(sup_in, rhs3.shape),
        rhs3,
    )
    y, v, w = y3[0], y3[1], y3[2]

    # 2. ICI combine: 6 scalars per device -> replicated interface solve
    vals = jnp.stack(
        [
            y[..., 0],
            y[..., -1],
            v[..., 0],
            v[..., -1],
            w[..., 0],
            w[..., -1],
        ],
        axis=-1,
    )  # (..., 6)
    allv = jax.lax.all_gather(vals, axis_name)  # (S, ..., 6)
    s = allv.shape[0]
    allv = jnp.moveaxis(allv, 0, -2)  # (..., S, 6)
    # the last device has no right neighbour: zero its w column
    last_mask = (jnp.arange(s) < s - 1).astype(dtype)
    y_l = allv[..., 0]
    y_r = allv[..., 1]
    v_l = allv[..., 2]
    v_r = allv[..., 3]
    w_l = allv[..., 4] * last_mask
    w_r = allv[..., 5] * last_mask

    n2 = 2 * s
    batch = y_l.shape[:-1]
    eye = jnp.broadcast_to(jnp.eye(n2, dtype=dtype), (*batch, n2, n2))
    i = jnp.arange(s)
    row_l = 2 * i
    row_r = 2 * i + 1
    col_rp = jnp.clip(2 * i - 1, 0, n2 - 1)  # R_{i-1}; v_0 == 0 so clip safe
    col_ln = jnp.clip(2 * i + 2, 0, n2 - 1)  # L_{i+1}; w_last == 0
    A = eye
    A = A.at[..., row_l, col_rp].add(-v_l)
    A = A.at[..., row_l, col_ln].add(-w_l)
    A = A.at[..., row_r, col_rp].add(-v_r)
    A = A.at[..., row_r, col_ln].add(-w_r)
    b = jnp.stack([y_l, y_r], axis=-1).reshape(*batch, n2)
    u = jnp.linalg.solve(A, b[..., None])[..., 0]

    # 3. local back-substitution with this device's interface neighbours
    r_prev = jnp.where(
        idx > 0, jnp.take(u, jnp.clip(2 * idx - 1, 0, n2 - 1), axis=-1), 0.0
    )
    l_next = jnp.where(
        idx < s - 1,
        jnp.take(u, jnp.clip(2 * idx + 2, 0, n2 - 1), axis=-1),
        0.0,
    )
    return y + v * r_prev[..., None] + w * l_next[..., None]
