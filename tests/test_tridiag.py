import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acmpc_tpu.ops.tridiag import tridiag_matvec, tridiag_solve


def _random_dd_system(rng, n):
    """Random strictly diagonally dominant tridiagonal system."""
    sub = rng.uniform(-1.0, 1.0, n)
    sup = rng.uniform(-1.0, 1.0, n)
    diag = np.abs(sub) + np.abs(sup) + rng.uniform(1.0, 3.0, n)
    rhs = rng.uniform(-5.0, 5.0, n)
    return sub, diag, sup, rhs


def _dense(sub, diag, sup):
    n = len(diag)
    T = np.diag(diag)
    T += np.diag(sub[1:], -1)
    T += np.diag(sup[:-1], 1)
    return T


@pytest.mark.parametrize("n", [1, 2, 3, 7, 49, 128, 1000, 4097])
def test_tridiag_solve_matches_dense(n):
    rng = np.random.default_rng(n)
    sub, diag, sup, rhs = _random_dd_system(rng, n)
    expected = np.linalg.solve(_dense(sub, diag, sup), rhs)
    got = tridiag_solve(
        jnp.asarray(sub), jnp.asarray(diag), jnp.asarray(sup), jnp.asarray(rhs)
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-4, atol=2e-5)


def test_tridiag_matvec_matches_dense():
    rng = np.random.default_rng(0)
    sub, diag, sup, _ = _random_dd_system(rng, 33)
    x = rng.uniform(-1, 1, 33)
    expected = _dense(sub, diag, sup) @ x
    got = tridiag_matvec(
        jnp.asarray(sub), jnp.asarray(diag), jnp.asarray(sup), jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5, atol=1e-6)


def test_tridiag_solve_batched():
    rng = np.random.default_rng(7)
    n, batch = 65, 16
    systems = [_random_dd_system(rng, n) for _ in range(batch)]
    sub = jnp.asarray(np.stack([s[0] for s in systems]))
    diag = jnp.asarray(np.stack([s[1] for s in systems]))
    sup = jnp.asarray(np.stack([s[2] for s in systems]))
    rhs = jnp.asarray(np.stack([s[3] for s in systems]))
    got = jax.jit(tridiag_solve)(sub, diag, sup, rhs)
    for i, (a, b, c, d) in enumerate(systems):
        expected = np.linalg.solve(_dense(a, b, c), d)
        np.testing.assert_allclose(
            np.asarray(got[i]), expected, rtol=2e-4, atol=2e-5
        )


def test_spd_inverse_blocked():
    """Recursive block-Schur SPD inverse (ops/spd_inverse.py — the
    TPU-side replacement for batched Cholesky) matches numpy, batched
    and at non-power-of-2 sizes."""
    import numpy as np
    import jax.numpy as jnp
    from acmpc_tpu.ops.spd_inverse import spd_inverse

    rng = np.random.default_rng(0)
    for n, batch in ((2, ()), (7, ()), (37, (3,)), (248, (2,))):
        M = rng.normal(size=(*batch, n, n)).astype(np.float32)
        K = M @ np.swapaxes(M, -1, -2) + n * np.eye(n, dtype=np.float32)
        inv = np.asarray(spd_inverse(jnp.asarray(K)))
        resid = np.eye(n) - K @ inv
        assert np.abs(resid).max() < 1e-3, (n, batch, np.abs(resid).max())
