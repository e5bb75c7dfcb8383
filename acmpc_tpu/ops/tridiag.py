"""Tridiagonal linear-system ops, TPU-first.

The speed-profile QP's ADMM x-update is a symmetric, strictly diagonally
dominant tridiagonal solve (see qp/speed_profile.py). The reference hands
this to OSQP's sparse LDLT on the CPU
(/root/reference/src/acmpc/control/solvers/speed_profile.py:61-86); on TPU a
sequential Thomas sweep would serialise ~10^4 tiny steps, so we use
**parallel cyclic reduction (PCR)**: O(log N) data-parallel steps of pure
vector ops, which XLA fuses into a handful of VPU passes. This is the
"sequence-parallel QP reduction over the horizon" named in SURVEY.md §5.7.

All functions are jit/vmap-compatible with static shapes and support
arbitrary leading batch dimensions.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def tridiag_matvec(
    sub: jnp.ndarray, diag: jnp.ndarray, sup: jnp.ndarray, x: jnp.ndarray
) -> jnp.ndarray:
    """y = T x for T tridiagonal.

    ``sub``/``sup`` have shape (..., N) with sub[..., 0] and sup[..., -1]
    ignored (kept same-length for shape stability): row i is
    ``sub[i]*x[i-1] + diag[i]*x[i] + sup[i]*x[i+1]``.
    """
    lower = jnp.concatenate(
        [jnp.zeros_like(x[..., :1]), sub[..., 1:] * x[..., :-1]], axis=-1
    )
    upper = jnp.concatenate(
        [sup[..., :-1] * x[..., 1:], jnp.zeros_like(x[..., :1])], axis=-1
    )
    return lower + diag * x + upper


def _shift_right(x: jnp.ndarray, s: int, fill: float) -> jnp.ndarray:
    """x[i] <- x[i-s] with ``fill`` for i < s (static shift)."""
    pad = jnp.full_like(x[..., :s], fill)
    return jnp.concatenate([pad, x[..., :-s]], axis=-1)


def _shift_left(x: jnp.ndarray, s: int, fill: float) -> jnp.ndarray:
    """x[i] <- x[i+s] with ``fill`` for i >= N-s (static shift)."""
    pad = jnp.full_like(x[..., :s], fill)
    return jnp.concatenate([x[..., s:], pad], axis=-1)


def tridiag_solve(
    sub: jnp.ndarray,
    diag: jnp.ndarray,
    sup: jnp.ndarray,
    rhs: jnp.ndarray,
) -> jnp.ndarray:
    """Solve T x = rhs by parallel cyclic reduction.

    Stable for the diagonally dominant systems produced by the QP engine
    (diag exceeds |sub| + |sup| by at least the ADMM sigma + rho margin).
    Shapes as in :func:`tridiag_matvec`; N is static. log2(N) reduction
    steps, each O(N) elementwise — no sequential recurrence anywhere.
    """
    n = rhs.shape[-1]
    if n == 1:
        return rhs / diag

    a = sub.at[..., 0].set(0.0)
    c = sup.at[..., -1].set(0.0)
    b = diag
    d = rhs

    n_steps = max(1, math.ceil(math.log2(n)))
    for step in range(n_steps):
        s = 1 << step
        if s >= n:
            break
        # Neighbours at distance s; out-of-range rows behave like the
        # identity row (a=0, b=1, c=0, d=0) so the updates are no-ops there.
        b_m = _shift_right(b, s, 1.0)
        b_p = _shift_left(b, s, 1.0)
        a_m = _shift_right(a, s, 0.0)
        c_p = _shift_left(c, s, 0.0)
        c_m = _shift_right(c, s, 0.0)
        a_p = _shift_left(a, s, 0.0)
        d_m = _shift_right(d, s, 0.0)
        d_p = _shift_left(d, s, 0.0)

        alpha = -a / b_m
        beta = -c / b_p

        a = alpha * a_m
        c = beta * c_p
        b = b + alpha * c_m + beta * a_p
        d = d + alpha * d_m + beta * d_p

    return d / b
