"""Reference-path representation and waypoint construction.

TPU-native counterpart of the reference's ``ReferencePath`` container
(/root/reference/src/acmpc/control/paths.py:4-72) and
``SpatialMPC.construct_waypoints``
(/root/reference/src/acmpc/control/spatial_mpc.py:125-154).

Design: instead of a mutable (7, N) numpy array with named row views, the
path is an immutable struct-of-arrays pytree. Every field is a ``(..., N)``
array so the whole structure batches transparently under ``vmap`` /
``shard_map`` (leading axes are scenario/track batch axes). All geometry is
computed as pure, jit-compatible jnp ops — no Python loops, static shapes.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

_EPS = 1e-12  # matches the reference's epsilon (spatial_mpc.py:34)


@struct.dataclass
class ReferencePath:
    """Struct-of-arrays waypoint path. All fields share shape ``(..., N)``.

    Fields mirror the 7 named rows of the reference container:
    xs, ys          world/BEV coordinates of each waypoint
    psis            heading of the segment leaving each waypoint
    kappas          discrete curvature at each waypoint
    distances       arc length of the segment leaving each waypoint
    widths          drivable width at each waypoint
    velocities      reference speed profile (filled by the speed-profile QP)
    """

    xs: jnp.ndarray
    ys: jnp.ndarray
    psis: jnp.ndarray
    kappas: jnp.ndarray
    distances: jnp.ndarray
    widths: jnp.ndarray
    velocities: jnp.ndarray

    @property
    def n_points(self) -> int:
        return self.xs.shape[-1]

    def state(self, index: int) -> jnp.ndarray:
        """``[x, y, psi]`` at a waypoint (reference paths.py:66-70)."""
        return jnp.stack(
            [self.xs[..., index], self.ys[..., index], self.psis[..., index]],
            axis=-1,
        )


def wrap_to_pi(angle: jnp.ndarray) -> jnp.ndarray:
    """Wrap angles into (-pi, pi] the way the reference does
    (spatial_mpc.py:149-150, dynamics.py:36-37)."""
    return jnp.mod(angle + jnp.pi, 2.0 * jnp.pi) - jnp.pi


def construct_waypoints(waypoint_coordinates: jnp.ndarray) -> ReferencePath:
    """Turn an ``(N+1, 3)`` array of ``[x, y, width]`` into a ReferencePath
    of N waypoints.

    Numerics follow the reference exactly (spatial_mpc.py:125-154):
    psi_i   = atan2(p_{i+1} - p_i)
    ds_i    = |p_{i+1} - p_i|
    kappa_i = wrap(psi_i - psi_{i-1}) / (ds_i + eps) + eps, with the
              "behind" angle of point 0 taken from the wrapped-around last
              point, and kappa_0 overwritten with kappa_1.
    widths come from rows 1..N (the *next* point's width column).
    """
    coords = waypoint_coordinates
    current = coords[:-1, :2]
    nxt = coords[1:, :2]
    # previous-of-first wraps to the last coordinate (spatial_mpc.py:137-139)
    previous = jnp.concatenate([coords[-1:, :2], coords[:-2, :2]], axis=0)

    diffs_ahead = nxt - current
    diffs_behind = current - previous

    psis = jnp.arctan2(diffs_ahead[:, 1], diffs_ahead[:, 0])
    distances = jnp.linalg.norm(diffs_ahead, axis=1)

    angles_behind = jnp.arctan2(diffs_behind[:, 1], diffs_behind[:, 0])
    angle_diffs = wrap_to_pi(psis - angles_behind)
    kappas = angle_diffs / (distances + _EPS) + _EPS
    kappas = kappas.at[0].set(kappas[1])

    return ReferencePath(
        xs=coords[:-1, 0],
        ys=coords[:-1, 1],
        psis=psis,
        kappas=kappas,
        distances=distances,
        widths=coords[1:, 2],
        velocities=jnp.zeros_like(psis),
    )
