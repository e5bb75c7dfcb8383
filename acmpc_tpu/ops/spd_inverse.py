"""Batched SPD inversion built entirely from matmuls.

XLA's batched Cholesky + triangular solve is the wrong shape for the
MXU — sequential panel factorisations dominate the batched MPC step
(measured: 21 ms of a 28 ms step at batch 256, horizon 50 on v5e, vs
<2 GFLOP of actual arithmetic). This module inverts the ADMM KKT matrix
K = P + sigma I + A' diag(rho) A with a RECURSIVE BLOCK-SCHUR scheme:

    K = [[K11, K12], [K12', K22]],
    K⁻¹ = [[K11⁻¹ + U S⁻¹ U', -U S⁻¹], [-S⁻¹ U', S⁻¹]],
    U = K11⁻¹ K12,  S = K22 - K12' U   (SPD Schur complement)

applied top-down with halving block sizes — every level is a handful of
batched matmuls, the only non-matmul work is a closed-form 2x2 leaf.
Two guarded Newton-Schulz polish steps (same guard as qp/admm._factor)
absorb the fp32 accumulation error. For the ~1e4-conditioned,
Ruiz-equilibrated KKT systems the QP engine produces, the polished
inverse matches the Cholesky-based one to ~1e-5.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _inverse_recursive(K: jnp.ndarray) -> jnp.ndarray:
    """K: (..., n, n) SPD with n a power of 2 (>= 2)."""
    n = K.shape[-1]
    if n <= 2:
        a = K[..., 0, 0]
        b = K[..., 0, 1]
        c = K[..., 1, 1]
        det = a * c - b * b
        inv = jnp.stack(
            [
                jnp.stack([c, -b], axis=-1),
                jnp.stack([-b, a], axis=-1),
            ],
            axis=-2,
        )
        return inv / det[..., None, None]

    h = n // 2
    k11 = K[..., :h, :h]
    k12 = K[..., :h, h:]
    k22 = K[..., h:, h:]
    inv11 = _inverse_recursive(k11)
    u = inv11 @ k12  # (..., h, h)
    s = k22 - jnp.swapaxes(k12, -1, -2) @ u
    inv_s = _inverse_recursive(s)
    top_right = -(u @ inv_s)
    top_left = inv11 - top_right @ jnp.swapaxes(u, -1, -2)
    bottom_right = inv_s
    bottom_left = jnp.swapaxes(top_right, -1, -2)
    top = jnp.concatenate([top_left, top_right], axis=-1)
    bottom = jnp.concatenate([bottom_left, bottom_right], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def spd_inverse(K: jnp.ndarray, polish_steps: int = 2) -> jnp.ndarray:
    """Explicit inverse of a batched SPD matrix, matmuls only.

    Pads to the next power of 2 with an identity block (whose inverse is
    itself, so the slice-back is exact), runs the block-Schur recursion,
    then ``polish_steps`` guarded Newton-Schulz corrections
    M <- M + M(I - KM), each applied only while it contracts
    (||I - KM||_F < 1 — see qp/admm._factor for why the guard matters).
    """
    n = K.shape[-1]
    np2 = 1 << (n - 1).bit_length()
    if np2 != n:
        batch = K.shape[:-2]
        padded = jnp.zeros((*batch, np2, np2), K.dtype)
        padded = padded.at[..., :n, :n].set(K)
        idx = jnp.arange(n, np2)
        padded = padded.at[..., idx, idx].set(1.0)
        K_work = padded
    else:
        K_work = K

    M = _inverse_recursive(K_work)[..., :n, :n]

    eye = jnp.eye(n, dtype=K.dtype)
    for _ in range(polish_steps):
        R = eye - K @ M
        contracts = jnp.sum(R * R, axis=(-2, -1), keepdims=True) < 1.0
        M = jnp.where(contracts, M + M @ R, M)
    return M
