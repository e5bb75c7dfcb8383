"""Kinematic spatial bicycle model.

TPU-native counterpart of the reference model
(/root/reference/src/acmpc/control/dynamics.py:9-103). State is the spatial
error frame (e_y, e_psi, t) along a reference path, inputs are (v, kappa)
with kappa = tan(delta)/L. The three operations — temporal->spatial
(``t2s``), spatial->temporal (``s2t``) and per-waypoint Jacobian
linearisation (``linearise``) — are pure jnp functions over whole paths:
`linearise` produces the full stacked A (N,3,3), B (N,3,2), f (N,3) in one
shot with no Python loop, so it fuses into the downstream QP assembly under
jit and batches under vmap.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from acmpc_tpu.dynamics.vehicle import VehicleParams
from acmpc_tpu.geometry.path import ReferencePath, wrap_to_pi

_EPS = 1e-12  # reference dynamics.py:21


def t2s(reference_waypoint: jnp.ndarray, reference_state: jnp.ndarray) -> jnp.ndarray:
    """Temporal state [x, y, psi] -> spatial state [e_y, e_psi, t] relative
    to a reference waypoint [x_r, y_r, psi_r] (reference dynamics.py:23-40)."""
    ref_x, ref_y, ref_psi = (
        reference_waypoint[..., 0],
        reference_waypoint[..., 1],
        reference_waypoint[..., 2],
    )
    x, y, psi = (
        reference_state[..., 0],
        reference_state[..., 1],
        reference_state[..., 2],
    )
    e_y = jnp.cos(ref_psi) * (y - ref_y) - jnp.sin(ref_psi) * (x - ref_x)
    e_psi = wrap_to_pi(psi - ref_psi)
    t = jnp.zeros_like(e_y)
    return jnp.stack([e_y, e_psi, t], axis=-1)


def s2t(path: ReferencePath, spatial_states: jnp.ndarray) -> jnp.ndarray:
    """Spatial states (N, 3) -> temporal [xs, ys, psis] stacked as (3, N)
    along the waypoints of ``path`` (reference dynamics.py:42-63)."""
    xs = path.xs - spatial_states[..., 0] * jnp.sin(path.psis)
    ys = path.ys + spatial_states[..., 0] * jnp.cos(path.psis)
    psis = path.psis + spatial_states[..., 1]
    return jnp.stack([xs, ys, psis], axis=-2)


def linearise(path: ReferencePath, time_mode: str = "reference"):
    """Jacobian linearisation of the spatial dynamics around the reference
    velocities/curvatures of ``path`` (reference dynamics.py:65-103).

    Returns ``(f, A, B)`` with shapes (N, 3), (N, 3, 3), (N, 3, 2):
      A_k = [[1,         ds_k, 0],
             [-k_k^2 ds, 1,    0],
             [dt_dey_k,  0,    1]]
      B_k = [[0, 0], [0, ds_k], [dt_dv_k, 0]]
      f_k = [0, 0, dt_nom_k]

    Time-row conventions. The physical stage time is
    dt = ds (1 - kappa e_y) / v, whose linearisation is
      dt_nom = ds/v,  dt_dv = -ds/v^2,  dt_dey = -kappa ds/v
    (``time_mode="exact"``). The reference's coefficients
    (dynamics.py:84-101) instead divide by (v ds):
      dt_nom = 1/(v ds),  dt_dv = -1/(v^2 ds),  dt_dey = -kappa/(v ds)
    — dimensionally a clock only at ds == 1 m (``time_mode="reference"``,
    the default).

    The default stays "reference" DELIBERATELY: inside the control QP the
    time state is a cost-shaping variable, decoupled from the e_y/e_psi
    rows, and every shipped track config's time weights
    (final_cost[2] etc.) were tuned against the reference's units —
    costing physical seconds instead makes the planner outrun the
    lateral-acceleration-limited speed profile by several m/s in
    hairpins. The place where a REAL clock matters is the temporal
    command selector (commands.py:20-38): at 2 m waypoint spacing the
    reference's cum_time runs 4x fast and the selector applies commands
    planned for stages far down the horizon — an actively destabilising
    feedback at speed (verified: a car 2 m off a dead-straight centreline
    at ~20 m/s diverges on the reference's clock). This framework
    therefore computes the published ``MPCState.cum_time`` EXACTLY from
    the solved plan kinematics at extraction (SpatialMPC._extract) —
    zero linearisation error — and never reads the QP's internal time
    state as a clock.
    """
    ds = path.distances
    kappa = path.kappas
    v = path.velocities
    zeros = jnp.zeros_like(ds)
    ones = jnp.ones_like(ds)

    if time_mode == "reference":
        dt_dey = -kappa / (v * ds + _EPS)
        dt_dv = -1.0 / (v**2 * ds + _EPS)
        dt_nom = 1.0 / (v * ds + _EPS)
    else:
        dt_dey = -kappa * ds / (v + _EPS)
        dt_dv = -ds / (v**2 + _EPS)
        dt_nom = ds / (v + _EPS)

    a_1 = jnp.stack([ones, ds, zeros], axis=-1)
    a_2 = jnp.stack([-(kappa**2) * ds, ones, zeros], axis=-1)
    a_3 = jnp.stack([dt_dey, zeros, ones], axis=-1)
    A = jnp.stack([a_1, a_2, a_3], axis=-2)

    b_1 = jnp.stack([zeros, zeros], axis=-1)
    b_2 = jnp.stack([zeros, ds], axis=-1)
    b_3 = jnp.stack([dt_dv, zeros], axis=-1)
    B = jnp.stack([b_1, b_2, b_3], axis=-2)

    f = jnp.stack([zeros, zeros, dt_nom], axis=-1)
    return f, A, B


@dataclasses.dataclass(frozen=True)
class SpatialBicycleModel:
    """Bundles vehicle geometry with velocity limits; exposes the input
    box constraints used by the control QP (reference dynamics.py:9-21)."""

    vehicle: VehicleParams
    min_velocity: float
    max_velocity: float

    @property
    def length(self) -> float:
        return self.vehicle.wheelbase

    @property
    def width(self) -> float:
        return self.vehicle.width

    @property
    def delta_max(self) -> float:
        return self.vehicle.max_steering_angle

    @property
    def margin(self) -> float:
        return self.vehicle.margin

    @property
    def kappa_max(self) -> float:
        return float(np.tan(self.delta_max) / self.length)

    @property
    def min_u(self) -> np.ndarray:
        return np.array([self.min_velocity, -self.kappa_max])

    @property
    def max_u(self) -> np.ndarray:
        return np.array([self.max_velocity, self.kappa_max])
