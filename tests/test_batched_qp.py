"""Direct battery for the explicitly-batched QP engine (qp/batched.py):
convergence-loop equivalence with the per-scenario solver, straggler
freezing, converged-tile skipping, and the RTI fixed-budget path."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from acmpc_tpu.qp.admm import ADMMConfig, solve_box_qp
from acmpc_tpu.qp.batched import solve_box_qp_batched
from test_admm import _check_kkt, _random_qp

# the batched engine runs fixed rho by design (the MPC family is tuned
# for it); random box QPs want a smaller step than the MPC default
CFG = ADMMConfig(adaptive_rho=False, rho=0.01, max_iter=20000)


def _batch(seeds, n=20, m=30):
    qps = [_random_qp(np.random.default_rng(s), n, m, eq_rows=4) for s in seeds]
    stack = lambda i: jnp.stack([qp[i] for qp in qps])
    return qps, tuple(stack(i) for i in range(5))


def test_batched_engine_matches_per_scenario():
    qps, (P, q, A, l, u) = _batch(range(6))
    sols = jax.jit(
        lambda *a: solve_box_qp_batched(*a, CFG)
    )(P, q, A, l, u)
    assert (np.asarray(sols.status) == 1).all()
    for i, qp in enumerate(qps):
        _check_kkt(*qp, jax.tree.map(lambda s: s[i], sols))
        single = jax.jit(lambda *a: solve_box_qp(*a, CFG))(*qp)
        np.testing.assert_allclose(
            np.asarray(sols.x[i]), np.asarray(single.x), rtol=1e-2, atol=1e-2
        )


def test_tile_skip_equivalent():
    """Converged-tile skipping must not change any scenario's solution:
    frozen lanes keep their iterates either way."""
    qps, (P, q, A, l, u) = _batch(range(8))
    base = jax.jit(lambda *a: solve_box_qp_batched(*a, CFG))(P, q, A, l, u)
    skip_cfg = dataclasses.replace(CFG, tile_skip=True)
    skip = jax.jit(
        lambda *a: solve_box_qp_batched(*a, skip_cfg)
    )(P, q, A, l, u)
    np.testing.assert_array_equal(
        np.asarray(base.status), np.asarray(skip.status)
    )
    np.testing.assert_allclose(
        np.asarray(base.x), np.asarray(skip.x), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(base.iterations), np.asarray(skip.iterations)
    )


def test_rti_fixed_budget_path():
    qps, (P, q, A, l, u) = _batch(range(4))
    cfg = dataclasses.replace(CFG, fixed_iterations=150)
    sols = jax.jit(lambda *a: solve_box_qp_batched(*a, cfg))(P, q, A, l, u)
    assert (np.asarray(sols.iterations) == 150).all()
    for i, qp in enumerate(qps):
        if int(sols.status[i]) in (1, 3):
            _check_kkt(*qp, jax.tree.map(lambda s: s[i], sols), tol=2e-2)


def test_spd_inverse_on_real_mpc_kkt():
    """The block-Schur inverse (the TPU-side _factor) must match the
    Cholesky inverse on REAL horizon-50 control-QP KKT matrices — the
    exact workload it replaces on hardware."""
    import sys

    sys.path.insert(0, ".")
    import __graft_entry__ as ge
    from acmpc_tpu.ops.spd_inverse import spd_inverse
    from acmpc_tpu.qp.admm import _factor, _rho_vector, _ruiz_equilibrate

    H, B = 50, 4
    mpc = ge._make_mpc(H)
    refs = ge._reference_window(H, B)
    states = jax.vmap(lambda: mpc.initial_state(), axis_size=B)()
    v_max = jnp.full((B,), mpc.config.constraints.v_max, mpc.dtype)
    is_loc = jnp.zeros((B,), bool)
    offs = jnp.zeros((B,), mpc.dtype)
    _, _, (P, q, A, l, u) = jax.jit(
        lambda s: jax.vmap(mpc._prepare)(s, refs, v_max, is_loc, offs)
    )(states)
    with jax.default_matmul_precision("highest"):
        Ps, qs, As, c, d, e = jax.vmap(
            lambda P_, q_, A_: _ruiz_equilibrate(P_, q_, A_, 5)
        )(P, q, A)
        rv = jax.vmap(
            lambda lo, hi: _rho_vector(jnp.asarray(0.1, jnp.float32), lo, hi)
        )(e * l, e * u)
        n = P.shape[-1]
        K = Ps + 1e-5 * jnp.eye(n) + jnp.einsum(
            "bmn,bm,bmk->bnk", As, rv, As
        )
        M_blocked = spd_inverse(K)
        M_chol = jax.vmap(
            lambda P_, A_, r_: _factor(P_, A_, r_, jnp.asarray(1e-5, jnp.float32))
        )(Ps, As, rv)
        eye = jnp.eye(n)
        r_blocked = np.asarray(
            jnp.max(jnp.abs(eye - K @ M_blocked), axis=(1, 2))
        )
        r_chol = np.asarray(jnp.max(jnp.abs(eye - K @ M_chol), axis=(1, 2)))
    assert r_blocked.max() < 1e-3, r_blocked
    # no worse than 10x the Cholesky residual on any scenario
    assert (r_blocked <= 10 * np.maximum(r_chol, 1e-6)).all()
