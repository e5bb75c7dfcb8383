"""Fused ADMM iteration kernel (Pallas/TPU).

The ADMM inner loop is a chain of small dependent ops: one stacked GEMV
x_t = W [x; rho z - y] + c0, one GEMV z_t = A x_t, and an elementwise
relax/project/dual-update. Under XLA each iteration re-reads the big
per-scenario operators (W is ~640 KB at horizon 50) from HBM; for a 256-
scenario batch that is ~4 GB of HBM traffic per 25-iteration chunk, which
dominates the solve.

This kernel runs the WHOLE iteration chunk for a tile of scenarios with
every operand resident in VMEM: the grid walks scenario tiles, each
program instance DMAs its tile's W/A once and loops ``n_iters`` times on
it. HBM traffic drops by the iteration count; the elementwise chain fuses
into the same kernel.

Shapes are padded to lane boundaries by the caller (qp/admm.py):
  W  (B, NP, NP + MP)   c0 (B, NP)      x (B, NP)
  A  (B, MP, NP)        rho/ls/us (B, MP)  z, y (B, MP)
Padding rows/cols are zero (rho pad = 1 to keep divisions finite).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _admm_kernel(
    n_iters: int,
    alpha: float,
    W_ref,
    A_ref,
    c0_ref,
    rho_ref,
    ls_ref,
    us_ref,
    x_ref,
    z_ref,
    y_ref,
    x_out,
    z_out,
    y_out,
):
    W = W_ref[:]
    A = A_ref[:]
    # vectors arrive as (bt, 1, N) — the singleton keeps their BlockSpec's
    # trailing dims equal to the full array dims, which lets b_tile be
    # smaller than the 8-sublane minimum (VMEM budget control)
    c0 = c0_ref[:, 0, :]
    rho = rho_ref[:, 0, :]
    ls = ls_ref[:, 0, :]
    us = us_ref[:, 0, :]
    inv_rho = 1.0 / rho

    b_tile = W.shape[0]

    def _bmv(M, v):
        """Per-scenario matrix-vector products, unrolled — Mosaic's dot
        lowering wants plain 2-D contractions, not batch dims."""
        outs = [
            jax.lax.dot_general(
                M[j],
                v[j],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            for j in range(b_tile)
        ]
        return jnp.stack(outs, axis=0)

    def one_iter(_, carry):
        x, z, y = carry
        u = jnp.concatenate([x, rho * z - y], axis=-1)  # (bt, NP+MP)
        xt = _bmv(W, u) + c0
        zt = _bmv(A, xt)
        x_new = alpha * xt + (1.0 - alpha) * x
        z_relax = alpha * zt + (1.0 - alpha) * z
        z_new = jnp.clip(z_relax + y * inv_rho, ls, us)
        y_new = y + rho * (z_relax - z_new)
        return x_new, z_new, y_new

    x, z, y = jax.lax.fori_loop(
        0,
        n_iters,
        one_iter,
        (x_ref[:, 0, :], z_ref[:, 0, :], y_ref[:, 0, :]),
    )
    x_out[:] = x[:, None, :]
    z_out[:] = z[:, None, :]
    y_out[:] = y[:, None, :]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit, static_argnames=("n_iters", "alpha", "b_tile", "interpret")
)
def admm_iterations_pallas(
    W: jnp.ndarray,  # (B, NP, NP+MP) padded
    A: jnp.ndarray,  # (B, MP, NP)
    c0: jnp.ndarray,  # (B, NP)
    rho: jnp.ndarray,  # (B, MP)
    ls: jnp.ndarray,
    us: jnp.ndarray,
    x: jnp.ndarray,
    z: jnp.ndarray,
    y: jnp.ndarray,
    n_iters: int,
    alpha: float = 1.6,
    b_tile: int = 4,
    interpret: bool = False,
):
    """Run ``n_iters`` fused ADMM iterations for every scenario. All
    arrays pre-padded to lane multiples; returns updated (x, z, y)."""
    B, NP, K = W.shape
    MP = A.shape[1]
    assert B % b_tile == 0, f"batch {B} not divisible by tile {b_tile}"
    grid = (B // b_tile,)

    def tile3(shape):
        return pl.BlockSpec(
            (b_tile, *shape), lambda i: (i, *([0] * len(shape))),
            memory_space=pltpu.VMEM,
        )

    def vec(n):  # vectors carried as (B, 1, n)
        return tile3((1, n))

    kernel = functools.partial(_admm_kernel, n_iters, alpha)
    out_shapes = [
        jax.ShapeDtypeStruct((B, 1, NP), W.dtype),
        jax.ShapeDtypeStruct((B, 1, MP), W.dtype),
        jax.ShapeDtypeStruct((B, 1, MP), W.dtype),
    ]
    unvec = lambda a: a[:, None, :]
    xo, zo, yo = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            tile3((NP, K)),
            tile3((MP, NP)),
            vec(NP),
            vec(MP),
            vec(MP),
            vec(MP),
            vec(NP),
            vec(MP),
            vec(MP),
        ],
        out_specs=[vec(NP), vec(MP), vec(MP)],
        out_shape=out_shapes,
        interpret=interpret,
    )(
        W,
        A,
        unvec(c0),
        unvec(rho),
        unvec(ls),
        unvec(us),
        unvec(x),
        unvec(z),
        unvec(y),
    )
    return xo[:, 0, :], zo[:, 0, :], yo[:, 0, :]
