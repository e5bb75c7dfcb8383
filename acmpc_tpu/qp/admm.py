"""First-party batched ADMM solver for box-constrained QPs.

    minimize    1/2 x'Px + q'x
    subject to  l <= Ax <= u

This replaces OSQP — the C library at the heart of the reference's control
loop (/root/reference/src/acmpc/control/solvers/control.py:88-106,
solvers/speed_profile.py:61-86) — with a TPU-native design:

* the whole solve is one jitted program: Ruiz equilibration, per-constraint
  step sizes, a `lax.while_loop` of ADMM chunks with OSQP-style residual
  checks and adaptive rho (with in-loop batched refactorisation);
* the KKT x-update uses a dense Cholesky of P + sigma*I + A' diag(rho) A.
  The control QP is ~250 vars — dense-blocked beats sparse on the MXU, and
  thousands of scenarios batch into one big `vmap`ped factorisation;
* fp32 throughout, with one step of iterative refinement on each linear
  solve to recover OSQP-like (fp64 sparse LDLT) accuracy;
* every matmul runs at Precision.HIGHEST: on TPU (and some XLA CPU builds)
  default fp32 matmuls round through bf16, which injects ~1e-3 relative
  error into the KKT system — fatal for a solver chasing 1e-3 residuals.
  The 6-pass fp32-equivalent MXU mode is mandatory here, not optional.

Algorithm follows Stellato et al., "OSQP: An Operator Splitting Solver for
Quadratic Programs" (the public algorithm; no OSQP code is used).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct

_INF = 1e30  # bounds with |value| >= _INF/1e4 are treated as loose
_MIN_SCALING = 1e-4
_MAX_SCALING = 1e4

STATUS_MAX_ITER = 0
STATUS_SOLVED = 1
STATUS_PRIMAL_INFEASIBLE = 2
# OSQP's "solved inaccurate": the iteration budget ran out with residuals
# inside cfg.inaccurate_factor * tolerance. fp64 OSQP rarely needs it; an
# fp32 engine does — on the hardest horizon-50 problems the dual residual
# floors within a small multiple of the fp64-calibrated 1e-3 tolerance,
# and treating that as failure would discard a control sequence accurate
# to ~3e-3 in normalised units (far below actuation noise).
STATUS_SOLVED_INACCURATE = 3


@dataclasses.dataclass(frozen=True)
class ADMMConfig:
    # proximal regularisation: OSQP defaults to 1e-6, but fp32 needs the
    # extra decade — at 1e-6 the x-update system K = P + sigma I + A'RA is
    # ~1e8-conditioned and (even Newton-refined) its inverse floors the
    # dual residual at ~4e-3 on the hardest horizon-50 windows; 1e-5
    # conditions K an order better with no measurable solution bias
    sigma: float = 1e-5
    rho: float = 0.1
    alpha: float = 1.6
    eps_abs: float = 1e-3
    eps_rel: float = 1e-3
    eps_prim_inf: float = 1e-4
    # residuals within this multiple of tolerance at max_iter count as
    # STATUS_SOLVED_INACCURATE (OSQP's reduced-accuracy acceptance)
    inaccurate_factor: float = 3.0
    max_iter: int = 4000
    # RTI mode: run EXACTLY this many iterations with no convergence
    # checks inside the loop (one residual check at the end) — constant
    # step time, no lockstep straggler cost under vmap, warm starts carry
    # progress across control steps (the real-time-iteration scheme).
    fixed_iterations: int | None = None
    check_every: int = 25
    scaling_iters: int = 10
    # extra iterative-refinement solves per x-update; 0 because the
    # explicit inverse is already ~1e-6 accurate and every refinement adds
    # sequential matvecs to the latency-critical inner loop
    refine_steps: int = 0
    adaptive_rho: bool = True
    adaptive_rho_tol: float = 5.0
    # matmul precision for the inner-iteration GEMVs only; factorisation,
    # scaling and residual checks always run at "highest". "tensorfloat32"
    # converges on the MPC problem family; "default" (bf16) does not.
    iter_precision: str = "highest"
    # fused Pallas iteration kernel routing (ops/pallas_admm.py).
    # "auto" (default) is batch-adaptive on TPU: an un-vmapped solve runs
    # the plain XLA GEMV chunk (fastest at batch 1), while any vmapped
    # solve routes through a custom_vmap rule that MERGES the mapped axes
    # into the kernel's scenario-tile axis — the operators stay
    # VMEM-resident across the whole chunk for a wide tile of scenarios
    # (measured: +23% at B=64, +36% at B=256 over XLA batched GEMVs on
    # v5e). Off-TPU, "auto" means the XLA chunk. "on" forces the kernel
    # everywhere (interpret mode off-TPU — used by the parity tests);
    # "off" forces the XLA chunk.
    use_pallas: str = "auto"  # "auto" | "on" | "off"
    # converged-tile skipping in the batched convergence loop (scalar-
    # prefetch activity flags; ops/pallas_admm._admm_kernel_active).
    # Default off: at the production operating point warm starts converge
    # in a single chunk, so there is nothing to skip (measured no-op),
    # and the flag only pays off for cold batches with extreme straggler
    # spread. Flip on per-call where that is the workload.
    tile_skip: bool = False


@struct.dataclass
class QPSolution:
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray
    status: jnp.ndarray  # STATUS_SOLVED / STATUS_MAX_ITER
    iterations: jnp.ndarray
    r_prim: jnp.ndarray
    r_dual: jnp.ndarray

    @property
    def solved(self) -> jnp.ndarray:
        return (self.status == STATUS_SOLVED) | (
            self.status == STATUS_SOLVED_INACCURATE
        )


def _inf_norm(x, axis=None):
    return jnp.max(jnp.abs(x), axis=axis)


def _ruiz_equilibrate(P, q, A, n_iters):
    """Modified Ruiz equilibration of the KKT matrix [[P, A'], [A, 0]] plus
    cost normalisation. Returns scaled (P, q, A) and scalings (c, d, e):
    P_s = c * D P D,  q_s = c * D q,  A_s = E A D."""
    n = q.shape[-1]
    m = A.shape[-2]
    d = jnp.ones(n, P.dtype)
    e = jnp.ones(m, P.dtype)
    c = jnp.asarray(1.0, P.dtype)

    def body(_, carry):
        P, q, A, d, e, c = carry
        col_norm = jnp.maximum(_inf_norm(P, axis=-2), _inf_norm(A, axis=-2))
        row_norm = _inf_norm(A, axis=-1)
        dd = 1.0 / jnp.sqrt(jnp.clip(col_norm, _MIN_SCALING, _MAX_SCALING))
        ee = 1.0 / jnp.sqrt(jnp.clip(row_norm, _MIN_SCALING, _MAX_SCALING))
        P = P * dd[:, None] * dd[None, :]
        q = q * dd
        A = A * ee[:, None] * dd[None, :]
        d = d * dd
        e = e * ee
        # cost normalisation (OSQP sec. 5.1)
        p_cols = jnp.mean(_inf_norm(P, axis=-2))
        g = 1.0 / jnp.clip(
            jnp.maximum(p_cols, _inf_norm(q)), _MIN_SCALING, _MAX_SCALING
        )
        P = P * g
        q = q * g
        c = c * g
        return P, q, A, d, e, c

    P, q, A, d, e, c = jax.lax.fori_loop(
        0, n_iters, body, (P, q, A, d, e, c), unroll=True
    )
    return P, q, A, c, d, e


def _rho_vector(rho, l, u):
    """Per-constraint step size: equality rows get 1e3*rho, loose rows
    1e-6*rho (OSQP's constraint classification)."""
    loose = (l <= -_INF / 1e4) & (u >= _INF / 1e4)
    eq = (u - l) < 1e-6
    return jnp.where(eq, rho * 1e3, jnp.where(loose, rho * 1e-6, rho))


def _factor(P, A, rho_vec, sigma):
    """Explicit inverse of K = P + sigma*I + A' diag(rho) A.

    TPU-critical design choice: a triangular solve with a *vector* RHS
    inside the iteration loop costs ~10ms on TPU (sequential
    substitution), while a matmul against a precomputed inverse is ~50us.
    So we pay one Cholesky + one multi-RHS triangular solve (matmul-shaped,
    fast) per factorisation and make every ADMM iteration pure MXU work.
    The inverse is accurate to ~1e-6 for our ~1e4-conditioned KKT systems;
    optional in-loop refinement (cfg.refine_steps) covers worse cases.
    (Woodbury on the control QP's diagonal-plus-low-rank structure was
    tried and is numerically DOOMED in fp32: loose box rows make the
    diagonal part near-singular, so the capacitance is ~1e8-conditioned
    and the assembled inverse is garbage. ops/spd_inverse.py offers an
    all-matmul block-Schur alternative for generic dense SPD batches.)
    """
    n = P.shape[-1]
    K = P + sigma * jnp.eye(n, dtype=P.dtype)
    K = K + (A.T * rho_vec[None, :]) @ A
    if jax.default_backend() == "tpu":
        # all-matmul block-Schur inversion: XLA's batched Cholesky +
        # triangular solve is panel-sequential and measured 2.1x slower
        # at (256, 248, 248); off-TPU LAPACK wins
        from acmpc_tpu.ops.spd_inverse import spd_inverse

        return spd_inverse(K)
    L = jnp.linalg.cholesky(K)
    L_inv = jax.scipy.linalg.solve_triangular(
        L, jnp.eye(n, dtype=P.dtype), lower=True
    )
    M = L_inv.T @ L_inv
    # Two GUARDED Newton steps on the inverse, M <- M + M(I - KM): each
    # squares the residual R = I - KM, recovering the accuracy fp32
    # Cholesky loses on ill-conditioned K. Without this the ADMM dual
    # residual floors at a few times tolerance on hard horizon-50
    # problems; with it r_dual reaches ~1e-4 in 50 iterations. Newton
    # iteration on an inverse only contracts when ||R|| < 1 — on
    # ~1e8-conditioned K (e.g. rho pushed to its 1e6 cap) the fp32
    # Cholesky residual exceeds 1 and an unguarded step DIVERGES
    # (r_dual stalls ~rho). Guard each step on a measured contraction.
    # Four matmuls once per factorisation, amortised over every
    # iteration; unlike per-iteration refine_steps this also reaches
    # the fused Pallas path, which consumes K_inv via the stacked
    # operator.
    eye = jnp.eye(n, dtype=P.dtype)
    for _ in range(2):
        R = eye - K @ M
        contracts = jnp.sum(R * R) < 1.0  # ||R||_F < 1 => Newton contracts
        M = jnp.where(contracts, M + M @ R, M)
    return M


def _cho_solve(K_inv, b):
    return K_inv @ b


def solve_box_qp(
    P: jnp.ndarray,
    q: jnp.ndarray,
    A: jnp.ndarray,
    l: jnp.ndarray,
    u: jnp.ndarray,
    cfg: ADMMConfig = ADMMConfig(),
    x0: jnp.ndarray | None = None,
    y0: jnp.ndarray | None = None,
) -> QPSolution:
    """Solve one box QP. jit-compatible; batch with `jax.vmap`.

    P: (n, n) dense (symmetric); q: (n,); A: (m, n); l, u: (m,).
    Use +/-jnp.inf (or +/-1e30) for loose bounds.
    """
    with jax.default_matmul_precision("highest"):
        return _solve_box_qp_impl(P, q, A, l, u, cfg, x0, y0)


def _solve_box_qp_impl(P, q, A, l, u, cfg, x0, y0):
    dtype = q.dtype
    n = q.shape[-1]
    m = l.shape[-1]

    l = jnp.clip(l, -_INF, _INF)
    u = jnp.clip(u, -_INF, _INF)

    Ps, qs, As, c, d, e = _ruiz_equilibrate(P, q, A, cfg.scaling_iters)
    ls = e * l
    us = e * u

    sigma = jnp.asarray(cfg.sigma, dtype)

    x = jnp.zeros(n, dtype) if x0 is None else x0 / d
    y = jnp.zeros(m, dtype) if y0 is None else c * y0 / e
    z = jnp.clip(As @ x, ls, us)

    rho0 = jnp.asarray(cfg.rho, dtype)

    def residuals(x, y, z, rho_scalar):
        """Unscaled residuals + tolerances + adaptive-rho ratio."""
        Ax = As @ x
        Px = Ps @ x
        Aty = As.T @ y
        # unscale
        Ax_u = Ax / e
        z_u = z / e
        r_prim = _inf_norm(Ax_u - z_u)
        Px_u = (Px / d) / c
        Aty_u = (Aty / d) / c
        q_u = (qs / d) / c
        r_dual = _inf_norm(Px_u + Aty_u + q_u)
        eps_prim = cfg.eps_abs + cfg.eps_rel * jnp.maximum(
            _inf_norm(Ax_u), _inf_norm(z_u)
        )
        eps_dual = cfg.eps_abs + cfg.eps_rel * jnp.maximum(
            jnp.maximum(_inf_norm(Px_u), _inf_norm(Aty_u)), _inf_norm(q_u)
        )
        # Divergence guard: eps_prim/eps_dual are RELATIVE to the iterate
        # magnitudes (OSQP semantics), so an fp32 blow-up (|Ax| ~ 1e20 on
        # a pathological problem) can "satisfy" its own inflated
        # tolerance, or go NaN (every comparison False -> loops forever).
        # After Ruiz equilibration a sane iterate is O(1); treat anything
        # astronomically larger, or non-finite, as NOT converged.
        sane = (
            jnp.isfinite(r_prim)
            & jnp.isfinite(r_dual)
            & (_inf_norm(x) < 1e12)
        )
        converged = (r_prim <= eps_prim) & (r_dual <= eps_dual) & sane
        near = (
            (r_prim <= cfg.inaccurate_factor * eps_prim)
            & (r_dual <= cfg.inaccurate_factor * eps_dual)
            & sane
        )
        # adaptive rho ratio (normalised residuals)
        prim_n = r_prim / jnp.maximum(
            jnp.maximum(_inf_norm(Ax_u), _inf_norm(z_u)), 1e-10
        )
        dual_n = r_dual / jnp.maximum(
            jnp.maximum(jnp.maximum(_inf_norm(Px_u), _inf_norm(Aty_u)), _inf_norm(q_u)),
            1e-10,
        )
        ratio = jnp.sqrt(prim_n / jnp.maximum(dual_n, 1e-10))
        return r_prim, r_dual, converged, near, ratio

    # "on" forces the fused kernel (b_tile 1; interpret off-TPU, for
    # tests). "auto" on TPU is batch-adaptive: the chunk goes through a
    # custom_vmap dispatch — plain XLA GEMV loop when this solve is NOT
    # vmapped (fastest single-scenario form), the fused wide-tile kernel
    # when it IS (the vmap rule merges scenario axes; see
    # ops/pallas_admm._build_chunk_dispatch). refine_steps needs the
    # unstacked operator in-loop, which neither kernel path carries.
    force_pallas = cfg.use_pallas == "on"
    dispatch = (
        cfg.use_pallas == "auto"
        and jax.default_backend() == "tpu"
        and cfg.refine_steps == 0
    )
    use_padded = force_pallas or dispatch

    NP = -(-n // 128) * 128
    MP = -(-m // 128) * 128

    def _pad_n(v):
        return jnp.zeros((NP,), dtype).at[:n].set(v)

    def _pad_m(v, fill=0.0):
        return jnp.full((MP,), fill, dtype).at[:m].set(v)

    if use_padded:
        _Ap = jnp.zeros((MP, NP), dtype).at[:m, :n].set(As)
        _lsp = _pad_m(ls)
        _usp = _pad_m(us)

    def build_operator(K_inv):
        """Stacked x-update operator, built ONCE per factorisation:
        W = [sigma*Kinv | Kinv A'], c0 = -Kinv q. In padded modes the
        operator is stored pre-padded so chunks only pad vectors."""
        W = jnp.concatenate([sigma * K_inv, K_inv @ As.T], axis=-1)
        c0 = -(K_inv @ qs)
        if use_padded:
            Wp = jnp.zeros((NP, NP + MP), dtype)
            Wp = Wp.at[:n, :n].set(W[:, :n])
            Wp = Wp.at[:n, NP : NP + m].set(W[:, n:])
            return Wp, _pad_n(c0)
        return W, c0

    def admm_chunk(x, z, y, rho_vec, op, n_iters=None):
        """cfg.check_every relaxed ADMM iterations with a fixed operator.

        Latency-critical on TPU: each data-dependent op in this loop costs
        its full launch+execute latency (no pipelining across iterations),
        so the x-update is folded into ONE stacked GEMV
        [sigma*Kinv | Kinv A'] @ [x ; rho z - y] plus a constant, and the
        only other GEMV is z_t = A x_t. Everything else fuses on the VPU.
        With use_pallas the whole chunk becomes one fused kernel with the
        operator resident in VMEM across every iteration.
        """
        W, c0 = op

        if dispatch:
            from acmpc_tpu.ops.pallas_admm import _build_chunk_dispatch

            fn = _build_chunk_dispatch(
                int(n_iters or cfg.check_every),
                float(cfg.alpha),
                cfg.iter_precision,
            )
            xo, zo, yo = fn(
                _pad_n(x),
                _pad_m(z),
                _pad_m(y),
                _pad_m(rho_vec, 1.0),
                _lsp,
                _usp,
                W,
                c0,
                _Ap,
            )
            return xo[:n], zo[:m], yo[:m]

        if force_pallas:
            from acmpc_tpu.ops.pallas_admm import admm_iterations_pallas

            xo, zo, yo = admm_iterations_pallas(
                W[None],
                _Ap[None],
                c0[None],
                _pad_m(rho_vec, 1.0)[None],
                _lsp[None],
                _usp[None],
                _pad_n(x)[None],
                _pad_m(z)[None],
                _pad_m(y)[None],
                n_iters=int(n_iters or cfg.check_every),
                alpha=cfg.alpha,
                interpret=(jax.default_backend() != "tpu"),
            )
            return xo[0, :n], zo[0, :m], yo[0, :m]

        def one_iter(_, carry):
            x, z, y = carry
            xt = W @ jnp.concatenate([x, rho_vec * z - y], axis=-1) + c0
            for _ in range(cfg.refine_steps):
                K_inv = W[:, :n] / sigma
                rhs = sigma * x - qs + As.T @ (rho_vec * z - y)
                K_xt = (
                    Ps @ xt
                    + sigma * xt
                    + As.T @ (rho_vec * (As @ xt))
                )
                xt = xt + _cho_solve(K_inv, rhs - K_xt)
            zt = As @ xt
            x_new = cfg.alpha * xt + (1.0 - cfg.alpha) * x
            z_relax = cfg.alpha * zt + (1.0 - cfg.alpha) * z
            z_new = jnp.clip(z_relax + y / rho_vec, ls, us)
            y_new = y + rho_vec * (z_relax - z_new)
            return x_new, z_new, y_new

        with jax.default_matmul_precision(cfg.iter_precision):
            return jax.lax.fori_loop(
                0, n_iters or cfg.check_every, one_iter, (x, z, y)
            )

    rho_vec0 = _rho_vector(rho0, ls, us)
    op0 = build_operator(_factor(Ps, As, rho_vec0, sigma))

    if cfg.fixed_iterations is not None:
        # RTI path: fixed budget, single residual check at the end
        x, z, y = admm_chunk(
            x, z, y, rho_vec0, op0, n_iters=cfg.fixed_iterations
        )
        r_p, r_d, converged, near, _ = residuals(x, y, z, rho0)
        status = jnp.where(
            converged,
            STATUS_SOLVED,
            jnp.where(near, STATUS_SOLVED_INACCURATE, STATUS_MAX_ITER),
        )
        return QPSolution(
            x=x * d,
            y=y * e / c,
            z=z / e,
            status=status,
            iterations=jnp.asarray(cfg.fixed_iterations, jnp.int32),
            r_prim=r_p,
            r_dual=r_d,
        )

    def primal_infeasibility_certificate(dy):
        """OSQP primal-infeasibility test on a dual-ascent direction
        delta_y (Stellato et al. §3.4), in unscaled quantities. Rows we
        clipped to +/-1e30 self-exclude: any positive delta_y there blows
        the support function positive, as it should."""
        dy_u_norm = _inf_norm(e * dy) / c
        at_dy = _inf_norm((As.T @ dy) / d) / c
        support = (
            jnp.sum(us * jnp.maximum(dy, 0.0)) + jnp.sum(ls * jnp.minimum(dy, 0.0))
        ) / c
        eps = cfg.eps_prim_inf * jnp.maximum(dy_u_norm, 1e-30)
        return (dy_u_norm > 1e-12) & (at_dy <= eps) & (support <= -eps)

    def cond(state):
        _, _, _, _, _, it, done, _, _, _, _ = state
        return (~done) & (it < cfg.max_iter)

    def body(state):
        x, z, y, rho, op, it, done, r_p, r_d, _, status = state
        y_before = y
        x, z, y = admm_chunk(x, z, y, _rho_vector(rho, ls, us), op)
        it = it + cfg.check_every
        r_p, r_d, converged, near, ratio = residuals(x, y, z, rho)
        prim_inf = primal_infeasibility_certificate(y - y_before) & ~converged
        status = jnp.where(
            converged,
            STATUS_SOLVED,
            jnp.where(
                prim_inf,
                STATUS_PRIMAL_INFEASIBLE,
                # only takes effect if this is the last chunk (max_iter)
                jnp.where(near, STATUS_SOLVED_INACCURATE, STATUS_MAX_ITER),
            ),
        )
        done = converged | prim_inf
        if cfg.adaptive_rho:
            tol = cfg.adaptive_rho_tol
            need_update = (ratio > tol) | (ratio < 1.0 / tol)
            new_rho = jnp.clip(rho * ratio, 1e-6, 1e6)
            rho = jnp.where(need_update & ~done, new_rho, rho)
            refreshed = build_operator(
                _factor(Ps, As, _rho_vector(rho, ls, us), sigma)
            )
            op = jax.tree.map(
                lambda new, old: jnp.where(need_update & ~done, new, old),
                refreshed,
                op,
            )
        return (x, z, y, rho, op, it, done, r_p, r_d, ratio, status)

    r_p0 = jnp.asarray(jnp.inf, dtype)
    r_d0 = jnp.asarray(jnp.inf, dtype)
    init = (
        x,
        z,
        y,
        rho0,
        op0,
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
        r_p0,
        r_d0,
        jnp.asarray(1.0, dtype),
        jnp.asarray(STATUS_MAX_ITER, jnp.int32),
    )
    x, z, y, rho, op, it, done, r_p, r_d, _, status = jax.lax.while_loop(
        cond, body, init
    )
    return QPSolution(
        x=x * d,
        y=y * e / c,
        z=z / e,
        status=status,
        iterations=it,
        r_prim=r_p,
        r_dual=r_d,
    )
