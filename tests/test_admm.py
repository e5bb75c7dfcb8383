import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acmpc_tpu.qp.admm import ADMMConfig, solve_box_qp


def _random_qp(rng, n, m, eq_rows=0, loose_rows=0):
    """Random convex box QP; returns fp32 arrays."""
    M = rng.normal(size=(n, n))
    P = M @ M.T + 0.5 * np.eye(n)
    q = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    centre = A @ rng.normal(size=n)
    half = np.abs(rng.normal(size=m)) + 0.5
    l = centre - half
    u = centre + half
    for i in range(eq_rows):
        u[i] = l[i]
    for i in range(m - loose_rows, m):
        l[i] = -np.inf
        u[i] = np.inf
    to32 = lambda x: jnp.asarray(x, jnp.float32)
    return to32(P), to32(q), to32(A), to32(l), to32(u)


def _check_kkt(P, q, A, l, u, sol, tol=5e-3):
    """Solver-independent optimality check for a convex QP:
    primal feasibility + stationarity + complementary slackness."""
    P, q, A = np.asarray(P, np.float64), np.asarray(q, np.float64), np.asarray(A, np.float64)
    l, u = np.asarray(l, np.float64), np.asarray(u, np.float64)
    x, y = np.asarray(sol.x, np.float64), np.asarray(sol.y, np.float64)
    Ax = A @ x
    scale = max(1.0, np.abs(Ax).max())
    assert (Ax >= l - tol * scale).all(), "primal lower bound violated"
    assert (Ax <= u + tol * scale).all(), "primal upper bound violated"
    stat = P @ x + q + A.T @ y
    stat_scale = max(np.abs(P @ x).max(), np.abs(q).max(), 1.0)
    assert np.abs(stat).max() <= 10 * tol * stat_scale, (
        f"stationarity violated: {np.abs(stat).max()} vs {tol * stat_scale}"
    )
    # complementarity: positive multipliers pair with active upper bounds
    y_scale = max(1.0, np.abs(y).max())
    with np.errstate(invalid="ignore"):
        comp_u = np.where(np.isfinite(u), np.maximum(y, 0) * (u - Ax), 0.0)
        comp_l = np.where(np.isfinite(l), np.maximum(-y, 0) * (Ax - l), 0.0)
    assert np.abs(comp_u).max() <= 50 * tol * y_scale * scale
    assert np.abs(comp_l).max() <= 50 * tol * y_scale * scale


def _equality_qp_reference(P, q, A, b):
    """Closed-form solution of min .5x'Px+q'x s.t. Ax=b via the KKT system."""
    P, q = np.asarray(P, np.float64), np.asarray(q, np.float64)
    A, b = np.asarray(A, np.float64), np.asarray(b, np.float64)
    n, m = P.shape[0], A.shape[0]
    K = np.block([[P, A.T], [A, np.zeros((m, m))]])
    rhs = np.concatenate([-q, b])
    sol = np.linalg.solve(K, rhs)
    return sol[:n]


def test_equality_constrained_matches_closed_form():
    rng = np.random.default_rng(0)
    n, m = 20, 8
    P, q, A, l, u = _random_qp(rng, n, m, eq_rows=m)
    sol = jax.jit(lambda: solve_box_qp(P, q, A, l, u))()
    assert int(sol.status) == 1
    expected = _equality_qp_reference(P, q, A, np.asarray(l))
    np.testing.assert_allclose(np.asarray(sol.x), expected, rtol=5e-3, atol=5e-3)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_box_qp_kkt(seed):
    rng = np.random.default_rng(seed)
    P, q, A, l, u = _random_qp(rng, 30, 45, eq_rows=5, loose_rows=5)
    sol = jax.jit(solve_box_qp)(P, q, A, l, u)
    assert int(sol.status) == 1, f"not solved: r_prim={sol.r_prim} r_dual={sol.r_dual}"
    _check_kkt(P, q, A, l, u, sol)


def test_batched_vmap_solve():
    rng = np.random.default_rng(42)
    batch = 8
    qps = [_random_qp(rng, 16, 24, eq_rows=4) for _ in range(batch)]
    stack = lambda i: jnp.stack([qp[i] for qp in qps])
    P, q, A, l, u = (stack(i) for i in range(5))
    sols = jax.jit(jax.vmap(lambda *a: solve_box_qp(*a)))(P, q, A, l, u)
    assert sols.x.shape == (batch, 16)
    for i in range(batch):
        assert int(sols.status[i]) == 1
        sol_i = jax.tree.map(lambda s: s[i], sols)
        _check_kkt(*qps[i], sol_i)


def test_max_iter_reported():
    rng = np.random.default_rng(5)
    P, q, A, l, u = _random_qp(rng, 30, 40)
    cfg = ADMMConfig(max_iter=25, check_every=25, eps_abs=1e-9, eps_rel=1e-9)
    sol = jax.jit(lambda *a: solve_box_qp(*a, cfg))(P, q, A, l, u)
    assert int(sol.status) == 0
    assert int(sol.iterations) == 25


def test_primal_infeasibility_certificate():
    """Contradictory equality rows must be flagged as primal infeasible
    quickly (the reference relies on OSQP's certificate to keep serving
    old commands without burning the iteration budget)."""
    rng = np.random.default_rng(3)
    n = 12
    M = rng.normal(size=(n, n))
    P = jnp.asarray(M @ M.T + np.eye(n), jnp.float32)
    q = jnp.asarray(rng.normal(size=n), jnp.float32)
    A = jnp.asarray(np.vstack([np.eye(n)[:1], np.eye(n)[:1], np.eye(n)]), jnp.float32)
    l = np.zeros(n + 2, np.float32)
    u = np.zeros(n + 2, np.float32)
    l[0] = u[0] = 0.0   # x0 == 0
    l[1] = u[1] = 5.0   # and x0 == 5 -> infeasible
    l[2:] = -10.0
    u[2:] = 10.0
    sol = jax.jit(solve_box_qp)(P, q, A, jnp.asarray(l), jnp.asarray(u))
    assert int(sol.status) == 2, f"status={int(sol.status)} it={int(sol.iterations)}"
    assert int(sol.iterations) < 1000  # detected early, not at max_iter


def test_pallas_vmap_merges_into_kernel_batch():
    """vmap over the forced-pallas solve must reach the fused kernel
    through its custom_vmap merge rule (one wide-tile kernel call, not a
    (B, 1)-serialised grid) and agree with the XLA path per scenario."""
    rng = np.random.default_rng(11)
    batch = 4
    qps = [_random_qp(rng, 16, 24, eq_rows=4) for _ in range(batch)]
    stack = lambda i: jnp.stack([qp[i] for qp in qps])
    P, q, A, l, u = (stack(i) for i in range(5))
    off = jax.jit(
        jax.vmap(lambda *a: solve_box_qp(*a, ADMMConfig(use_pallas="off")))
    )(P, q, A, l, u)
    on = jax.jit(
        jax.vmap(lambda *a: solve_box_qp(*a, ADMMConfig(use_pallas="on")))
    )(P, q, A, l, u)
    np.testing.assert_array_equal(np.asarray(on.status), np.asarray(off.status))
    assert (np.asarray(on.status) == 1).all()
    # Both paths converge per-scenario; the batched while_loop may stop a
    # chunk earlier/later between paths, so compare optima at solver
    # tolerance and verify the kernel path's solutions by KKT.
    np.testing.assert_allclose(
        np.asarray(on.x), np.asarray(off.x), rtol=1e-2, atol=1e-2
    )
    for i in range(batch):
        _check_kkt(*qps[i], jax.tree.map(lambda s: s[i], on))


def test_pallas_chunk_matches_xla():
    """Fused Pallas iteration kernel (interpret mode on CPU) returns the
    same solution as the XLA chunk path."""
    rng = np.random.default_rng(7)
    n, m = 20, 30
    M = rng.normal(size=(n, n))
    P = jnp.asarray(M @ M.T + 0.5 * np.eye(n), jnp.float32)
    q = jnp.asarray(rng.normal(size=n), jnp.float32)
    A = jnp.asarray(rng.normal(size=(m, n)), jnp.float32)
    centre = np.asarray(A) @ rng.normal(size=n)
    half = np.abs(rng.normal(size=m)) + 0.5
    l = jnp.asarray(centre - half, jnp.float32)
    u = jnp.asarray(centre + half, jnp.float32)
    ref = jax.jit(
        lambda: solve_box_qp(P, q, A, l, u, ADMMConfig(use_pallas="off"))
    )()
    pal = jax.jit(
        lambda: solve_box_qp(P, q, A, l, u, ADMMConfig(use_pallas="on"))
    )()
    assert int(ref.status) == 1 and int(pal.status) == 1
    assert int(ref.iterations) == int(pal.iterations)
    np.testing.assert_allclose(
        np.asarray(pal.x), np.asarray(ref.x), rtol=1e-4, atol=1e-4
    )
