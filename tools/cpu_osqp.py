"""First-party fp64 CPU implementation of the public OSQP algorithm.

The osqp wheel is not installable in this environment, so this module
provides a faithful scipy-sparse implementation of the algorithm OSQP runs
(Stellato et al., "OSQP: An Operator Splitting Solver for Quadratic
Programs" — the public paper; no OSQP source is used). It exists for two
jobs, both off the TPU hot path:

1. **CPU baseline measurement** (tools/measure_cpu_baseline.py): drive the
   reference's own control loop (/root/reference/src/acmpc/control/
   spatial_mpc.py:170-217) with this solver standing in for the missing
   `osqp` module, to fix the solves/s denominator in bench.py.
2. **fp64 parity oracle** (tests/test_reference_parity.py): solve the
   reference's exact QP matrices at eps=1e-9 in float64 and check the
   repo's fp32 TPU ADMM engine lands on the same optimum.

Algorithmic fidelity to OSQP defaults:
* modified Ruiz equilibration of [[P, A'], [A, 0]] + cost scaling
  (10 passes), sigma=1e-6, rho=0.1, alpha=1.6, eps_abs=eps_rel=1e-3;
* per-constraint rho: equality rows rho*1e3, loose rows rho*1e-6;
* the quasi-definite KKT system [[P+sigma I, A'], [A, -diag(1/rho)]]
  factorised sparsely (SuperLU here where OSQP uses QDLDL) and re-used
  across iterations; refactorised only on rho or A-value updates;
* termination checks on unscaled residuals every `check_termination`
  iterations, adaptive rho with tolerance 5, primal/dual infeasibility
  certificates;
* `update(q/l/u)` keeps the factorisation, `update(Ax=...)` refactorises,
  and solutions warm-start the next solve — the same cost profile the
  reference's `problem.update(...)` re-solve loop pays (reference
  control.py:100-106).
"""

from __future__ import annotations

from types import SimpleNamespace

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

OSQP_INFTY = 1e30
_MIN_SCALING = 1e-4
_MAX_SCALING = 1e4


class OSQP:
    """Drop-in stand-in for ``osqp.OSQP`` (setup/update/solve/warm_start)."""

    def setup(
        self,
        P=None,
        q=None,
        A=None,
        l=None,  # noqa: E741 - OSQP's own argument name
        u=None,
        verbose=False,
        max_iter=4000,
        eps_abs=1e-3,
        eps_rel=1e-3,
        eps_prim_inf=1e-4,
        eps_dual_inf=1e-4,
        rho=0.1,
        sigma=1e-6,
        alpha=1.6,
        scaling=10,
        check_termination=25,
        adaptive_rho=True,
        adaptive_rho_tolerance=5.0,
        **_unused,
    ):
        self._P0 = sp.csc_matrix(P, dtype=np.float64)
        self._A0 = sp.csc_matrix(A, dtype=np.float64)
        self._q0 = np.asarray(q, dtype=np.float64).copy()
        self._l0 = np.clip(np.asarray(l, np.float64), -OSQP_INFTY, OSQP_INFTY)
        self._u0 = np.clip(np.asarray(u, np.float64), -OSQP_INFTY, OSQP_INFTY)
        self._n = self._q0.shape[0]
        self._m = self._l0.shape[0]
        self._cfg = SimpleNamespace(
            max_iter=max_iter,
            eps_abs=eps_abs,
            eps_rel=eps_rel,
            eps_prim_inf=eps_prim_inf,
            eps_dual_inf=eps_dual_inf,
            rho=rho,
            sigma=sigma,
            alpha=alpha,
            scaling=scaling,
            check_termination=max(1, check_termination),
            adaptive_rho=adaptive_rho,
            adaptive_rho_tolerance=adaptive_rho_tolerance,
        )
        self._scale()
        self._rho = rho
        self._rho_vec = self._classify_rho(self._rho)
        self._factorise()
        self._x = np.zeros(self._n)
        self._y = np.zeros(self._m)
        self._z = np.zeros(self._m)

    # -- scaling ---------------------------------------------------------
    def _scale(self):
        """Modified Ruiz equilibration + cost normalisation (OSQP §5.1)."""
        P = self._P0.copy()
        A = self._A0.copy()
        q = self._q0.copy()
        n, m = self._n, self._m
        d = np.ones(n)
        e = np.ones(m)
        c = 1.0
        for _ in range(self._cfg.scaling):
            P_abs = abs(P)
            A_abs = abs(A)
            col_norm = np.maximum(
                P_abs.max(axis=0).toarray().ravel() if P.nnz else np.zeros(n),
                A_abs.max(axis=0).toarray().ravel() if A.nnz else np.zeros(n),
            )
            row_norm = (
                A_abs.max(axis=1).toarray().ravel() if A.nnz else np.zeros(m)
            )
            dd = 1.0 / np.sqrt(np.clip(col_norm, _MIN_SCALING, _MAX_SCALING))
            ee = 1.0 / np.sqrt(np.clip(row_norm, _MIN_SCALING, _MAX_SCALING))
            D = sp.diags(dd)
            E = sp.diags(ee)
            P = D @ P @ D
            A = E @ A @ D
            q = dd * q
            d *= dd
            e *= ee
            p_cols = (
                abs(P).max(axis=0).toarray().ravel().mean() if P.nnz else 0.0
            )
            g = 1.0 / np.clip(
                max(p_cols, np.abs(q).max() if q.size else 0.0),
                _MIN_SCALING,
                _MAX_SCALING,
            )
            P = P * g
            q = q * g
            c = c * g
        self._Ps = sp.csc_matrix(P)
        self._As = sp.csc_matrix(A)
        self._qs = q
        self._d, self._e, self._c = d, e, c
        self._ls = e * self._l0
        self._us = e * self._u0

    def _classify_rho(self, rho):
        loose = (self._ls <= -OSQP_INFTY * 1e-4) & (self._us >= OSQP_INFTY * 1e-4)
        eq = (self._us - self._ls) < 1e-6
        rho_vec = np.full(self._m, rho)
        rho_vec[loose] = rho * 1e-6
        rho_vec[eq] = rho * 1e3
        return rho_vec

    def _factorise(self):
        n, m = self._n, self._m
        KKT = sp.bmat(
            [
                [
                    self._Ps + self._cfg.sigma * sp.eye(n),
                    self._As.T,
                ],
                [self._As, -sp.diags(1.0 / self._rho_vec)],
            ],
            format="csc",
        )
        self._lu = spla.splu(KKT)

    # -- public API -------------------------------------------------------
    def update(self, q=None, l=None, u=None, Ax=None, Px=None):  # noqa: E741
        if q is not None:
            self._q0 = np.asarray(q, np.float64).copy()
            self._qs = self._c * self._d * self._q0
        if l is not None:
            self._l0 = np.clip(np.asarray(l, np.float64), -OSQP_INFTY, OSQP_INFTY)
            self._ls = self._e * self._l0
        if u is not None:
            self._u0 = np.clip(np.asarray(u, np.float64), -OSQP_INFTY, OSQP_INFTY)
            self._us = self._e * self._u0
        need_refactor = False
        if Px is not None:
            self._P0.data = np.asarray(Px, np.float64)
            D = sp.diags(self._d)
            self._Ps = sp.csc_matrix(self._c * (D @ self._P0 @ D))
            need_refactor = True
        if Ax is not None:
            self._A0.data = np.asarray(Ax, np.float64)
            self._As = sp.csc_matrix(
                sp.diags(self._e) @ self._A0 @ sp.diags(self._d)
            )
            need_refactor = True
        if l is not None or u is not None:
            new_rho = self._classify_rho(self._rho)
            if not np.array_equal(new_rho, self._rho_vec):
                self._rho_vec = new_rho
                need_refactor = True
        if need_refactor:
            self._factorise()

    def warm_start(self, x=None, y=None):
        if x is not None:
            self._x = np.asarray(x, np.float64) / self._d
        if y is not None:
            self._y = self._c * np.asarray(y, np.float64) / self._e

    def _residuals(self, x, y, z):
        d, e, c = self._d, self._e, self._c
        Ax_u = (self._As @ x) / e
        z_u = z / e
        Px_u = (self._Ps @ x) / d / c
        Aty_u = (self._As.T @ y) / d / c
        q_u = self._qs / d / c
        r_prim = np.abs(Ax_u - z_u).max() if self._m else 0.0
        r_dual = np.abs(Px_u + Aty_u + q_u).max()
        eps_prim = self._cfg.eps_abs + self._cfg.eps_rel * max(
            np.abs(Ax_u).max(initial=0.0), np.abs(z_u).max(initial=0.0)
        )
        eps_dual = self._cfg.eps_abs + self._cfg.eps_rel * max(
            np.abs(Px_u).max(initial=0.0),
            np.abs(Aty_u).max(initial=0.0),
            np.abs(q_u).max(initial=0.0),
        )
        prim_n = r_prim / max(
            np.abs(Ax_u).max(initial=0.0), np.abs(z_u).max(initial=0.0), 1e-10
        )
        dual_n = r_dual / max(
            np.abs(Px_u).max(initial=0.0),
            np.abs(Aty_u).max(initial=0.0),
            np.abs(q_u).max(initial=0.0),
            1e-10,
        )
        ratio = np.sqrt(prim_n / max(dual_n, 1e-10))
        return r_prim, r_dual, (r_prim <= eps_prim and r_dual <= eps_dual), ratio

    def _primal_infeasible(self, dy):
        if np.abs(dy).max(initial=0.0) <= 1e-12:
            return False
        dy_norm = np.abs(self._e * dy).max() / self._c
        at_dy = np.abs((self._As.T @ dy) / self._d).max() / self._c
        support = (
            np.sum(self._us * np.maximum(dy, 0.0))
            + np.sum(self._ls * np.minimum(dy, 0.0))
        ) / self._c
        eps = self._cfg.eps_prim_inf * max(dy_norm, 1e-30)
        return at_dy <= eps and support <= -eps

    def _dual_infeasible(self, dx):
        if np.abs(dx).max(initial=0.0) <= 1e-12:
            return False
        dx_norm = np.abs(self._d * dx).max()
        eps = self._cfg.eps_dual_inf * max(dx_norm, 1e-30)
        if np.abs((self._Ps @ dx) / self._d).max() / self._c > eps:
            return False
        if (self._qs @ dx) / self._c >= eps:
            return False
        Adx = (self._As @ dx) / self._e
        ok_rows = (
            (self._u0 >= OSQP_INFTY * 1e-4) | (Adx <= eps)
        ) & ((self._l0 <= -OSQP_INFTY * 1e-4) | (Adx >= -eps))
        return bool(np.all(ok_rows))

    def solve(self):
        cfg = self._cfg
        sigma, alpha = cfg.sigma, cfg.alpha
        x, y = self._x.copy(), self._y.copy()
        z = np.clip(self._As @ x, self._ls, self._us)
        n = self._n
        status = "maximum iterations reached"
        r_prim = r_dual = np.inf
        it = 0
        x_chk, y_chk = x.copy(), y.copy()
        while it < cfg.max_iter:
            for _ in range(cfg.check_termination):
                rhs = np.concatenate([sigma * x - self._qs, z - y / self._rho_vec])
                sol = self._lu.solve(rhs)
                xt = sol[:n]
                nu = sol[n:]
                zt = z + (nu - y) / self._rho_vec
                x = alpha * xt + (1.0 - alpha) * x
                z_r = alpha * zt + (1.0 - alpha) * z
                z_new = np.clip(z_r + y / self._rho_vec, self._ls, self._us)
                y = y + self._rho_vec * (z_r - z_new)
                z = z_new
                it += 1
            r_prim, r_dual, converged, ratio = self._residuals(x, y, z)
            if converged:
                status = "solved"
                break
            if self._primal_infeasible(y - y_chk):
                status = "primal infeasible"
                break
            if self._dual_infeasible(x - x_chk):
                status = "dual infeasible"
                break
            x_chk, y_chk = x.copy(), y.copy()
            if cfg.adaptive_rho and (
                ratio > cfg.adaptive_rho_tolerance
                or ratio < 1.0 / cfg.adaptive_rho_tolerance
            ):
                self._rho = float(np.clip(self._rho * ratio, 1e-6, 1e6))
                self._rho_vec = self._classify_rho(self._rho)
                self._factorise()
        self._x, self._y, self._z = x, y, z
        return SimpleNamespace(
            x=self._d * x,
            y=self._e * y / self._c,
            info=SimpleNamespace(
                status=status,
                iter=it,
                pri_res=r_prim,
                dua_res=r_dual,
            ),
        )


def _solve_active_kkt(P, A, q, rows, b_rows, delta, refine, x0, y0_rows):
    """Delta-regularised KKT solve on a fixed active set, with iterative
    refinement against the UNregularised system."""
    n = q.shape[0]
    k = len(rows)
    A_act = A[rows]
    if k:
        KKT = sp.bmat(
            [
                [P + delta * sp.eye(n), A_act.T],
                [A_act, -delta * sp.eye(k)],
            ],
            format="csc",
        )
    else:
        KKT = sp.csc_matrix(P + delta * sp.eye(n))
    rhs = np.concatenate([-q, b_rows])
    lu = spla.splu(KKT)
    sol = np.concatenate([x0, y0_rows])
    for _ in range(refine + 1):
        if k:
            resid = rhs - np.concatenate(
                [P @ sol[:n] + A_act.T @ sol[n:], A_act @ sol[:n]]
            )
        else:
            resid = rhs - P @ sol[:n]
        sol = sol + lu.solve(resid)
    return sol[:n], sol[n:]


def _polish(P, q, A, l, u, x, y, delta=1e-9, refine=3, max_pass=80):  # noqa: E741
    """Active-set solution polishing (OSQP §5.2, hardened).

    Seeds the active set from the ADMM duals, then iterates a primal-dual
    active-set correction: solve the reduced equality-constrained KKT
    system exactly (tiny regularisation + iterative refinement against the
    unregularised system), drop the worst wrong-sign dual, add the worst
    violated box row, repeat. Unlike OSQP's single-shot polish this
    recovers from a misidentified initial active set — needed because the
    MPC cost is singular along the time states, where stalled ADMM duals
    misclassify the active t-face and single-shot polish gets rejected.
    Returns (x, y) at ~machine precision, or None."""
    P = sp.csc_matrix(P)
    A = sp.csc_matrix(A)
    m = A.shape[0]
    eq = (u - l) < 1e-9
    low = (~eq) & (y < -1e-12)
    upp = (~eq) & (y > 1e-12)
    for _ in range(max_pass):
        act = eq | low | upp
        rows = np.where(act)[0]
        b_rows = np.where(eq | low, l, u)[rows]
        try:
            x_p, y_rows = _solve_active_kkt(
                P, A, q, rows, b_rows, delta, refine, x, y[rows]
            )
        except RuntimeError:
            return None
        y_p = np.zeros(m)
        y_p[rows] = y_rows
        scale = max(1.0, np.abs(A @ x_p).max(initial=0.0))
        tol = 1e-8 * scale
        # 1) drop the worst wrong-sign dual (low rows need y<=0, upp y>=0)
        bad = np.where(low & (y_p > tol), y_p, 0.0) + np.where(
            upp & (y_p < -tol), -y_p, 0.0
        )
        if bad.max(initial=0.0) > 0.0:
            i = int(np.argmax(bad))
            low[i] = upp[i] = False
            x, y = x_p, y_p
            continue
        # 2) add the worst violated inactive box row
        Ax = A @ x_p
        viol_lo = np.where(~act, l - Ax, 0.0)
        viol_hi = np.where(~act, Ax - u, 0.0)
        worst = max(viol_lo.max(initial=0.0), viol_hi.max(initial=0.0))
        if worst > tol:
            if viol_lo.max(initial=0.0) >= viol_hi.max(initial=0.0):
                low[int(np.argmax(viol_lo))] = True
            else:
                upp[int(np.argmax(viol_hi))] = True
            x, y = x_p, y_p
            continue
        # 3) clean: verify stationarity and return
        stat = np.abs(P @ x_p + q + A.T @ y_p).max()
        if stat > 1e-6 * max(1.0, np.abs(q).max()):
            return None
        return x_p, y_p
    return None


def solve_qp_fp64(P, q, A, l, u, eps=1e-9, max_iter=400_000, polish=True):  # noqa: E741
    """One-shot high-accuracy fp64 solve — the parity oracle.

    Runs the ADMM loop to `eps` (or a looser 1e-6 when polishing, since
    the polish step then lands on the exact optimum) and polishes."""
    prob = OSQP()
    q = np.asarray(q, np.float64)
    l = np.asarray(l, np.float64)  # noqa: E741
    u = np.asarray(u, np.float64)
    prob.setup(
        P=sp.csc_matrix(P),
        q=q,
        A=sp.csc_matrix(A),
        l=l,
        u=u,
        eps_abs=max(eps, 1e-6) if polish else eps,
        eps_rel=max(eps, 1e-6) if polish else eps,
        max_iter=max_iter,
        check_termination=50,
    )
    res = prob.solve()
    if polish and res.info.status in ("solved", "maximum iterations reached"):
        polished = _polish(P, q, A, l, u, res.x, res.y)
        if polished is not None:
            res.x, res.y = polished
            res.info.status = "solved"
            res.info.polished = True
    return res
