"""Dynamic bicycle model with Pacejka lateral tyres (offline validation).

Counterpart of the reference DynamicBicycleModel
(/root/reference/src/acmpc/control/dynamic_bicycle_model.py:6-160): a
6-state (x, y, yaw, vx, vy, yaw_rate) model with Pacejka magic-formula
lateral forces and fitted longitudinal motor/brake/friction curves. Used
for offline validation and rollout plots, not in the control loop — same
role as in the reference.

Differences: the model is a pure jnp function (vmap-able over parameter
grids — the BASELINE.json robustness batches perturb exactly these
parameters), and the longitudinal-curve fitting uses a jax Gauss-Newton
least-squares instead of scipy.curve_fit.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

# measured (speed, pedal, force) samples the reference fits its curves to
# (dynamic_bicycle_model.py:37-56). NOTE: the reference lists these forces
# in newtons but uses tonne-scale mass (1.16) and kN-scale tyre params —
# dividing F by its mass yields ~5700 m/s^2, a units inconsistency in the
# reference demo. We convert the samples to kN (below) so the model is
# dimensionally consistent (kN / tonne = m/s^2): full throttle ~5.7 m/s^2,
# full brake ~ -16 m/s^2, matching the agent's pedal-to-acceleration map
# (agent.py:94-99).
ACCELERATION_DATA = np.array(
    [
        [0.0, 1.0, 6612],
        [27.78, 1.0, 5684],
        [55.56, 1.0, 1160],
        [55.56, 0.0, -2436],
        [27.78, 0.0, -812],
        [11.11, 0.0, -238],
    ]
).T
BRAKING_DATA = np.array(
    [
        [55.56, 0.0, -2436],
        [27.78, 0.0, -812],
        [11.11, 0.0, -238],
        [55.56, -1.0, -18908],
        [27.78, -1.0, -17748],
        [11.11, -1.0, -17168],
    ]
).T
ACCELERATION_DATA[2] /= 1000.0  # N -> kN (see note above)
BRAKING_DATA = BRAKING_DATA.copy()
BRAKING_DATA[2] /= 1000.0


def long_force(data, params):
    """(cm1 - cm2 v - cm3 v^2) u - cf1 - cf2 v - cf3 v^2."""
    cm1, cm2, cm3, cf1, cf2, cf3 = params
    v, u = data[0], data[1]
    return (cm1 - cm2 * v - cm3 * v**2) * u - cf1 - cf2 * v - cf3 * v**2


def fit_long_force(data: np.ndarray, n_iters: int = 100) -> np.ndarray:
    """Gauss-Newton least squares for the longitudinal curve — the model
    is linear in its parameters so this solves exactly in one step, but we
    iterate for robustness against future nonlinear variants."""
    xy = jnp.asarray(data[:2])
    target = jnp.asarray(data[2])

    def residual(p):
        return long_force(xy, p) - target

    p = jnp.zeros(6)
    for _ in range(3):
        J = jax.jacobian(residual)(p)
        r = residual(p)
        p = p - jnp.linalg.lstsq(J, r)[0]
    return np.asarray(p)


@dataclasses.dataclass(frozen=True)
class PacejkaParams:
    """Tyre + body parameters (reference dynamic_bicycle_model.py:8-35)."""

    F_z0: float = 3.0
    Bf: float = 9.62
    Cf: float = 2.59
    Df: float = 4.120
    Ef: float = 1.0
    epsf: float = -0.0813
    Br: float = 8.62
    Cr: float = 2.65
    Dr: float = 4.617
    Er: float = 1.0
    epsr: float = -0.1263
    mass: float = 1.160
    Iz: float = 1.260
    g: float = 9.81
    h: float = 0.35
    lf: float = 1.51
    lr: float = 1.388
    brake_bias: float = 0.7

    @property
    def F_zf(self) -> float:
        return self.mass * self.g * self.lr / (self.lr + self.lf)

    @property
    def F_zr(self) -> float:
        return self.mass * self.g * self.lf / (self.lr + self.lf)


class DynamicBicycleModel:
    def __init__(self, params: PacejkaParams | None = None):
        self.p = params or PacejkaParams()
        accel = fit_long_force(ACCELERATION_DATA)
        brake = fit_long_force(BRAKING_DATA)
        self.Cm1, self.Cm2, self.Cm3 = accel[:3]
        self.Cb1, self.Cb2, self.Cb3 = brake[:3]
        self.Cfric1, self.Cfric2, self.Cfric3 = brake[3:]

    def _pacejka(self, alpha, B, C, D, E, eps, F_z):
        p = self.p
        load = D * (1 + eps * F_z / p.F_z0) * F_z / p.F_z0
        slip = B * alpha
        return load * jnp.sin(C * jnp.arctan2(slip - E * (slip - jnp.arctan2(slip, 1.0)), 1.0))

    def x_dot(self, state, control):
        """Continuous-time derivative; pure jnp, vmap over states/params."""
        p = self.p
        delta, acc = control[..., 0], control[..., 1]
        yaw = state[..., 2]
        vx, vy, r = state[..., 3], state[..., 4], state[..., 5]

        alpha_f = -jnp.arctan((r * p.lf + vy) / (vx + 1e-3)) + delta
        alpha_r = jnp.arctan((r * p.lr - vy) / (vx + 1e-3))

        F_fy = self._pacejka(alpha_f, p.Bf, p.Cf, p.Df, p.Ef, p.epsf, p.F_zf)
        F_ry = self._pacejka(alpha_r, p.Br, p.Cr, p.Dr, p.Er, p.epsr, p.F_zr)

        F_fric = -self.Cfric1 - self.Cfric2 * vx - self.Cfric3 * vx**2
        brake_curve = self.Cb1 - self.Cb2 * vx - self.Cb3 * vx**2
        motor_curve = self.Cm1 - self.Cm2 * vx - self.Cm3 * vx**2
        F_rx = brake_curve * (1 - p.brake_bias) * jnp.minimum(
            0.0, acc
        ) + motor_curve * jnp.maximum(0.0, acc)
        F_fx = brake_curve * p.brake_bias * jnp.minimum(0.0, acc)

        return jnp.stack(
            [
                vx * jnp.cos(yaw) - vy * jnp.sin(yaw),
                vx * jnp.sin(yaw) + vy * jnp.cos(yaw),
                r,
                (F_rx + F_fx + F_fric - F_fy * jnp.sin(delta)) / p.mass
                + vy * r,
                (F_ry + F_fy * jnp.cos(delta)) / p.mass - vx * r,
                (F_fy * p.lf * jnp.cos(delta) - F_ry * p.lr) / p.Iz,
            ],
            axis=-1,
        )

    def predict_next_state(self, state, control, dt: float = 0.05):
        """Euler step (reference predict_next_state, :88-160)."""
        xd = self.x_dot(jnp.asarray(state), jnp.asarray(control))
        return jnp.asarray(state) + xd * dt, xd

    def rollout(self, state0, controls, dt: float = 0.05):
        """Scan a control sequence into a trajectory (offline plots)."""

        def step(s, u):
            s2, _ = self.predict_next_state(s, u, dt)
            return s2, s2

        _, traj = jax.lax.scan(step, jnp.asarray(state0), jnp.asarray(controls))
        return traj
