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
