"""Raceline calculation (offline tool).

The reference implements a K1999-style raceline: for each point in
sequence, bisect toward the mean neighbour curvature while staying inside
the track polygon, for 1000 sweeps
(/root/reference/src/acmpc/utils/raceline_calculator.py:41-162) — an
inherently serial O(N * sweeps) host loop over shapely containment tests.

The TPU-native formulation solves the same problem as a handful of
whole-track QPs: parametrise the raceline as centre + alpha * normal with
alpha box-bounded by the drivable corridor, linearise the signed Menger
curvature in alpha, and minimise its squared norm with the framework's
own ADMM box-QP engine, re-linearising a few times. Every point updates
simultaneously; the box constraint replaces the polygon-containment
bisection.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _unit_normals(centre: jnp.ndarray) -> jnp.ndarray:
    d = jnp.roll(centre, -1, axis=0) - jnp.roll(centre, 1, axis=0)
    t = d / jnp.maximum(jnp.linalg.norm(d, axis=1, keepdims=True), 1e-9)
    return jnp.stack([-t[:, 1], t[:, 0]], axis=1)


def menger_curvature(pts: jnp.ndarray) -> jnp.ndarray:
    """Vectorised Menger curvature of every point of a closed polyline
    (reference raceline_calculator.py:41-54, all points at once)."""
    prev = jnp.roll(pts, 1, axis=0)
    nxt = jnp.roll(pts, -1, axis=0)
    v21 = prev - pts
    v23 = nxt - pts
    n21 = jnp.linalg.norm(v21, axis=1)
    n23 = jnp.linalg.norm(v23, axis=1)
    cos_t = jnp.clip(
        jnp.sum(v21 * v23, axis=1) / jnp.maximum(n21 * n23, 1e-12), -1.0, 1.0
    )
    theta = jnp.arccos(cos_t)
    sin_t = jnp.sin(theta)
    d13 = jnp.linalg.norm(v21 - v23, axis=1)
    return 2.0 * sin_t / jnp.maximum(d13, 1e-9)


def signed_curvature(p: jnp.ndarray) -> jnp.ndarray:
    """Signed Menger curvature in cross-product form — smooth everywhere
    (no arccos), suited to autodiff."""
    prev = jnp.roll(p, 1, axis=0)
    nxt = jnp.roll(p, -1, axis=0)
    v21 = prev - p
    v23 = nxt - p
    cross = v21[:, 0] * v23[:, 1] - v21[:, 1] * v23[:, 0]
    n21 = jnp.linalg.norm(v21, axis=1)
    n23 = jnp.linalg.norm(v23, axis=1)
    d13 = jnp.linalg.norm(v23 - v21, axis=1)
    return 2.0 * cross / jnp.maximum(n21 * n23 * d13, 1e-9)


def calculate_raceline(
    centre: np.ndarray,
    half_width: np.ndarray | float,
    margin: float = 1.0,
    n_iterations: int = 3,
    regularisation: float = 1e-8,
    return_alpha: bool = False,
) -> np.ndarray:
    """Minimum-curvature raceline for a closed track.

    centre: (N, 2) ordered closed centreline. half_width: corridor
    half-width per point (scalar or (N,)). Returns the (N, 2) raceline,
    or ``(raceline, alpha)`` with ``return_alpha`` — callers optimising
    on a decimated centreline should transfer the smooth lateral offset
    ``alpha`` onto their dense geometry rather than interpolate the
    coarse polyline itself (chord kinks every coarse segment read as
    phantom curvature spikes downstream).

    Method: parametrise the line as centre + alpha*normal, linearise the
    signed curvature kappa(alpha) ~ kappa0 + J alpha (J via jax.jacobian,
    banded), and solve

        min ||kappa0 + J alpha||^2   s.t.  |alpha| <= half_width - margin

    with the framework's own ADMM box-QP engine (qp/admm.py) — the
    sequential per-point polygon-bisection of the reference becomes one
    whole-track QP, re-linearised ``n_iterations`` times.
    """
    from acmpc_tpu.qp.admm import ADMMConfig, solve_box_qp

    centre = jnp.asarray(centre, jnp.float32)
    n = centre.shape[0]
    normals = _unit_normals(centre)
    bound = jnp.maximum(
        jnp.asarray(half_width, jnp.float32) - margin, 0.0
    ) * jnp.ones(n)

    def kappa_of(alpha):
        return signed_curvature(centre + alpha[:, None] * normals)

    alpha = jnp.zeros(n)
    solve = jax.jit(
        lambda P, q, A, l, u: solve_box_qp(
            P, q, A, l, u, ADMMConfig(max_iter=2000)
        )
    )
    eye = jnp.eye(n)
    for _ in range(n_iterations):
        kappa0 = kappa_of(alpha)
        J = jax.jacobian(kappa_of)(alpha)
        P = 2.0 * (J.T @ J) + regularisation * eye
        q = 2.0 * (J.T @ (kappa0 - J @ alpha))
        # curvatures are ~1e-3-scale, far below the solver's absolute
        # tolerance; rescale the objective (argmin-invariant) so the
        # termination criteria see an O(1) problem
        s = 1.0 / jnp.maximum(jnp.max(jnp.abs(q)), 1e-12)
        sol = solve(s * P, s * q, eye, -bound, bound)
        alpha = sol.x
    line = np.asarray(centre + alpha[:, None] * normals)
    if return_alpha:
        return line, np.asarray(alpha)
    return line
