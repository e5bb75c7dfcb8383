"""Explicitly-batched box-QP solve.

``jax.vmap(solve_box_qp)`` reaches the same fused iteration kernel (its
custom_vmap rule merges the mapped axis into the kernel's scenario tile —
ops/pallas_admm.py), so for most callers the vmap form is enough. This
entry keeps the batch explicit end-to-end for the paths that want
batch-level control: scaling/factorisation/residuals are vmapped XLA (all
matmul-shaped), iteration chunks go straight to the fused kernel, and the
straggler policy is explicit — finished scenarios FREEZE their iterates
while the rest keep iterating (vmapped while_loops instead run every lane
to the last straggler and rely on the per-lane `done` select).

Restrictions vs the general solver: fixed rho (no adaptive refactor — the
MPC configuration already runs fixed), primal-infeasibility certificates
and RTI mode supported. Scenarios that finish keep their results frozen
while stragglers iterate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from acmpc_tpu.ops.pallas_admm import admm_iterations_pallas
from acmpc_tpu.qp.admm import (
    ADMMConfig,
    QPSolution,
    STATUS_MAX_ITER,
    STATUS_PRIMAL_INFEASIBLE,
    STATUS_SOLVED,
    STATUS_SOLVED_INACCURATE,
    _INF,
    _factor,
    _rho_vector,
    _ruiz_equilibrate,
)


def solve_box_qp_batched(
    P: jnp.ndarray,  # (B, n, n)
    q: jnp.ndarray,  # (B, n)
    A: jnp.ndarray,  # (B, m, n)
    l: jnp.ndarray,  # (B, m)
    u: jnp.ndarray,  # (B, m)
    cfg: ADMMConfig = ADMMConfig(),
    x0: jnp.ndarray | None = None,
    y0: jnp.ndarray | None = None,
) -> QPSolution:
    assert not cfg.adaptive_rho, (
        "batched solver runs fixed rho; use vmap(solve_box_qp) for adaptive"
    )
    with jax.default_matmul_precision("highest"):
        return _impl(P, q, A, l, u, cfg, x0, y0)


def _impl(P, q, A, l, u, cfg, x0, y0):
    dtype = q.dtype
    B, n = q.shape
    m = l.shape[-1]
    NP = -(-n // 128) * 128
    MP = -(-m // 128) * 128
    interpret = jax.default_backend() != "tpu"

    l = jnp.clip(l, -_INF, _INF)
    u = jnp.clip(u, -_INF, _INF)

    Ps, qs, As, c, d, e = jax.vmap(
        lambda P, q, A: _ruiz_equilibrate(P, q, A, cfg.scaling_iters)
    )(P, q, A)
    ls = e * l
    us = e * u

    sigma = jnp.asarray(cfg.sigma, dtype)
    rho0 = jnp.asarray(cfg.rho, dtype)
    rho_vec = jax.vmap(lambda lo, hi: _rho_vector(rho0, lo, hi))(ls, us)

    K_inv = jax.vmap(lambda Ps_, As_, rv: _factor(Ps_, As_, rv, sigma))(
        Ps, As, rho_vec
    )

    # padded stacked operators, built once
    W = jnp.concatenate(
        [sigma * K_inv, jnp.einsum("bij,bkj->bik", K_inv, As)], axis=-1
    )  # (B, n, n+m)
    c0 = -jnp.einsum("bij,bj->bi", K_inv, qs)

    Wp = jnp.zeros((B, NP, NP + MP), dtype)
    Wp = Wp.at[:, :n, :n].set(W[:, :, :n])
    Wp = Wp.at[:, :n, NP : NP + m].set(W[:, :, n:])
    Ap = jnp.zeros((B, MP, NP), dtype).at[:, :m, :n].set(As)

    def pad_n(v):
        return jnp.zeros((B, NP), dtype).at[:, :n].set(v)

    def pad_m(v, fill=0.0):
        return jnp.full((B, MP), fill, dtype).at[:, :m].set(v)

    c0p = pad_n(c0)
    rhop = pad_m(rho_vec, 1.0)
    lsp = pad_m(ls)
    usp = pad_m(us)

    x = jnp.zeros((B, n), dtype) if x0 is None else x0 / d
    y = jnp.zeros((B, m), dtype) if y0 is None else c[:, None] * y0 / e
    z = jnp.clip(jnp.einsum("bij,bj->bi", As, x), ls, us)

    def chunk(x, z, y, n_iters, active=None):
        xo, zo, yo = admm_iterations_pallas(
            Wp, Ap, c0p, rhop, lsp, usp,
            pad_n(x), pad_m(z), pad_m(y),
            n_iters=n_iters, alpha=cfg.alpha,
            interpret=interpret, active=active,
        )
        return xo[:, :n], zo[:, :m], yo[:, :m]

    def batched_norm(v):
        return jnp.max(jnp.abs(v), axis=-1)

    def residuals(x, y, z):
        Ax = jnp.einsum("bij,bj->bi", As, x)
        Px = jnp.einsum("bij,bj->bi", Ps, x)
        Aty = jnp.einsum("bij,bi->bj", As, y)
        Ax_u = Ax / e
        z_u = z / e
        r_prim = batched_norm(Ax_u - z_u)
        Px_u = (Px / d) / c[:, None]
        Aty_u = (Aty / d) / c[:, None]
        q_u = (qs / d) / c[:, None]
        r_dual = batched_norm(Px_u + Aty_u + q_u)
        eps_prim = cfg.eps_abs + cfg.eps_rel * jnp.maximum(
            batched_norm(Ax_u), batched_norm(z_u)
        )
        eps_dual = cfg.eps_abs + cfg.eps_rel * jnp.maximum(
            jnp.maximum(batched_norm(Px_u), batched_norm(Aty_u)),
            batched_norm(q_u),
        )
        # divergence guard (see qp/admm.py residuals): a blown-up fp32
        # iterate inflates its own relative tolerance or goes NaN
        sane = (
            jnp.isfinite(r_prim)
            & jnp.isfinite(r_dual)
            & (batched_norm(x) < 1e12)
        )
        converged = (r_prim <= eps_prim) & (r_dual <= eps_dual) & sane
        near = (
            (r_prim <= cfg.inaccurate_factor * eps_prim)
            & (r_dual <= cfg.inaccurate_factor * eps_dual)
            & sane
        )
        return r_prim, r_dual, converged, near

    def prim_inf_certificate(dy):
        dy_u_norm = batched_norm(e * dy) / c
        at_dy = batched_norm(jnp.einsum("bij,bi->bj", As, dy) / d) / c
        support = (
            jnp.sum(us * jnp.maximum(dy, 0.0), axis=-1)
            + jnp.sum(ls * jnp.minimum(dy, 0.0), axis=-1)
        ) / c
        eps = cfg.eps_prim_inf * jnp.maximum(dy_u_norm, 1e-30)
        return (dy_u_norm > 1e-12) & (at_dy <= eps) & (support <= -eps)

    if cfg.fixed_iterations is not None:
        x, z, y = chunk(x, z, y, int(cfg.fixed_iterations))
        r_p, r_d, converged, near = residuals(x, y, z)
        status = jnp.where(
            converged,
            STATUS_SOLVED,
            jnp.where(near, STATUS_SOLVED_INACCURATE, STATUS_MAX_ITER),
        )
        return QPSolution(
            x=x * d,
            y=y * e / c[:, None],
            z=z / e,
            status=status,
            iterations=jnp.full((B,), cfg.fixed_iterations, jnp.int32),
            r_prim=r_p,
            r_dual=r_d,
        )

    def cond(state):
        _, _, _, it, done, _, _, _, _ = state
        return jnp.any(~done) & (it < cfg.max_iter)

    def body(state):
        x, z, y, it, done, r_p, r_d, status, its = state
        # tiles whose scenarios have all converged skip the chunk's
        # iteration loop inside the kernel (scalar-prefetch flag)
        active = ~done if cfg.tile_skip else None
        xn, zn, yn = chunk(x, z, y, int(cfg.check_every), active=active)
        # frozen scenarios keep their converged/certified iterates
        keep = done[:, None]
        xn = jnp.where(keep, x, xn)
        zn = jnp.where(keep, z, zn)
        yn_frozen = jnp.where(keep, y, yn)
        it = it + cfg.check_every
        r_pn, r_dn, converged, near = residuals(xn, yn_frozen, zn)
        prim_inf = prim_inf_certificate(yn_frozen - y) & ~converged & ~done
        newly_done = (converged | prim_inf) & ~done
        status = jnp.where(
            newly_done,
            jnp.where(converged, STATUS_SOLVED, STATUS_PRIMAL_INFEASIBLE),
            # still-running scenarios carry the near flag so a max_iter
            # exit reports STATUS_SOLVED_INACCURATE when within
            # inaccurate_factor * tolerance (OSQP semantics)
            jnp.where(
                ~done & near, STATUS_SOLVED_INACCURATE, jnp.where(~done, STATUS_MAX_ITER, status)
            ),
        )
        its = jnp.where(newly_done, it, its)
        done = done | newly_done
        r_p = jnp.where(done & ~newly_done, r_p, r_pn)
        r_d = jnp.where(done & ~newly_done, r_d, r_dn)
        return (xn, zn, yn_frozen, it, done, r_p, r_d, status, its)

    init = (
        x,
        z,
        y,
        jnp.asarray(0, jnp.int32),
        jnp.zeros((B,), bool),
        jnp.full((B,), jnp.inf, dtype),
        jnp.full((B,), jnp.inf, dtype),
        jnp.full((B,), STATUS_MAX_ITER, jnp.int32),
        jnp.full((B,), cfg.max_iter, jnp.int32),
    )
    x, z, y, it, done, r_p, r_d, status, its = jax.lax.while_loop(
        cond, body, init
    )
    return QPSolution(
        x=x * d,
        y=y * e / c[:, None],
        z=z / e,
        status=status,
        iterations=its,
        r_prim=r_p,
        r_dual=r_d,
    )
