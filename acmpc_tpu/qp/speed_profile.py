"""Speed-profile QP solver with banded structure exploited end-to-end.

Reference formulation (/root/reference/src/acmpc/control/solvers/
speed_profile.py:11-150): maximise per-waypoint velocity subject to
longitudinal acceleration limits via the finite-difference matrix
D1 (rows: (v_{i+1}-v_i)/(2*ds_i)) and a curvature-capped velocity box:

    minimize    1/2 ||v||^2 - vmax' v
    subject to  a_min <= D1 v <= a_max        (n-1 rows)
                v_lo  <=    v <= v_hi         (n rows)

The KKT x-update matrix P + sigma*I + rho*(D1'D1 + I) is symmetric
tridiagonal and strictly diagonally dominant, so each ADMM iteration is a
parallel-cyclic-reduction solve (ops/tridiag.py) — O(log N) depth, no
factorisation to cache, which also makes adaptive rho free. This scales to
the full-map profile (~10^4 waypoints, reference iteration cap 40000,
spatial_mpc.py:16) where a dense solve would be 800MB of matrix.

Two bound constructions mirror the reference:
* standard (speed_profile.py:26-45): dynamic v_max from sqrt(ay_max/|kappa|)
  (clamped below ki_min), floor at v_min, +2.0 headroom, optional terminal
  velocity override;
* localised (speed_profile.py:131-150): flat v_max (map speeds already
  encode curvature).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct

from acmpc_tpu.ops.tridiag import tridiag_solve
from acmpc_tpu.ops.tridiag_sharded import tridiag_solve_sharded
from acmpc_tpu.qp.admm import STATUS_MAX_ITER, STATUS_SOLVED, ADMMConfig

_EPS = 1e-12


@dataclasses.dataclass(frozen=True)
class SpeedProfileConstraints:
    """Static speed-profile constraint set (configs/<track>.yaml
    racing.control.speed_profile_constraints in the reference schema)."""

    v_min: float
    v_max: float
    a_min: float
    a_max: float
    ay_max: float
    ki_min: float
    end_velocity: float | None = None

    @classmethod
    def from_config(cls, cfg: dict) -> "SpeedProfileConstraints":
        return cls(
            v_min=cfg["v_min"],
            v_max=cfg["v_max"],
            a_min=cfg["a_min"],
            a_max=cfg["a_max"],
            ay_max=cfg["ay_max"],
            ki_min=cfg["ki_min"],
            end_velocity=cfg.get("end_velocity"),
        )


@struct.dataclass
class SpeedProfileSolution:
    velocities: jnp.ndarray
    status: jnp.ndarray
    iterations: jnp.ndarray
    r_prim: jnp.ndarray
    r_dual: jnp.ndarray


def velocity_upper_bounds(
    kappas: jnp.ndarray,
    constraints: SpeedProfileConstraints,
    v_max_runtime: jnp.ndarray,
    end_velocity: float | None,
) -> jnp.ndarray:
    """Curvature-capped per-waypoint velocity ceiling
    (reference speed_profile.py:26-45). ``v_max_runtime`` is the live
    reference speed pushed in by the agent each step."""
    abs_k = jnp.abs(kappas)
    v_max_dyn = jnp.sqrt(constraints.ay_max / (abs_k + _EPS))
    v_max_dyn = jnp.where(abs_k < constraints.ki_min, v_max_runtime, v_max_dyn)
    v_caps = jnp.minimum(v_max_dyn, v_max_runtime)
    v_caps = jnp.maximum(constraints.v_min, v_caps) + 2.0
    if end_velocity is not None:
        v_caps = v_caps.at[-1].set(end_velocity)
    return v_caps


def _min_plus_scan(caps: jnp.ndarray, slacks: jnp.ndarray) -> jnp.ndarray:
    """Exact solution of x_i = min(caps_i, x_{i-1} + slacks_{i-1}) via an
    associative scan over the (min, +) semiring.

    Each step is the map h_i(x) = min(M_i, x + S_i); these maps are closed
    under composition ((M2,S2)o(M1,S1) = (min(M2, M1+S2), S1+S2)), so the
    prefix composition is a `lax.associative_scan` — O(log N) depth.
    """
    big = jnp.asarray(jnp.inf, caps.dtype)
    S = jnp.concatenate([jnp.full_like(slacks[..., :1], big), slacks], axis=-1)

    def combine(left, right):
        m1, s1 = left
        m2, s2 = right
        return jnp.minimum(m2, m1 + s2), s1 + s2

    M, _ = jax.lax.associative_scan(combine, (caps, S), axis=-1)
    return M


def _min_plus_combine(left, right):
    m1, s1 = left
    m2, s2 = right
    return jnp.minimum(m2, m1 + s2), s1 + s2


def _min_plus_scan_sharded(
    caps: jnp.ndarray,
    slack_in: jnp.ndarray,
    axis_name: str,
    reverse_blocks: bool = False,
) -> jnp.ndarray:
    """Sharded (min,+) scan: per-block associative scans + ONE all_gather
    of each block's total map (2 floats per device) + a replicated
    exclusive composition over blocks + an elementwise fix-up. This is
    the horizon-parallel form of ``_min_plus_scan`` across the ICI —
    SURVEY.md §5.7's sequence-parallel reduction, device level.

    ``caps``/``slack_in`` are the LOCAL block (..., M); ``slack_in[.., 0]``
    is the edge slack CROSSING from the predecessor block (the caller
    masks the terminal block's to +inf). ``reverse_blocks`` interprets
    the device order right-to-left (the arrays themselves must already be
    flipped locally) — used for the backward pass without reshuffling
    data across devices.
    """
    idx = jax.lax.axis_index(axis_name)
    m_local, s_local = jax.lax.associative_scan(
        _min_plus_combine, (caps, slack_in), axis=-1
    )
    block = jnp.stack([m_local[..., -1], s_local[..., -1]], axis=-1)
    blocks = jax.lax.all_gather(block, axis_name)  # (S, ..., 2)
    s_dev = blocks.shape[0]
    order = range(s_dev - 1, -1, -1) if reverse_blocks else range(s_dev)

    big = jnp.asarray(jnp.inf, caps.dtype)
    m_acc = jnp.full(block.shape[:-1], big, caps.dtype)
    s_acc = jnp.zeros(block.shape[:-1], caps.dtype)
    prefix_m = [None] * s_dev
    for b in order:  # S is tiny (devices on the axis); replicated
        prefix_m[b] = m_acc
        m_acc, s_acc = _min_plus_combine(
            (m_acc, s_acc), (blocks[b, ..., 0], blocks[b, ..., 1])
        )
    prefix = jnp.stack(prefix_m, axis=0)  # (S, ...)
    mine = jnp.take(prefix, idx, axis=0)
    return jnp.minimum(m_local, mine[..., None] + s_local)


def solve_speed_profile_sharded(
    distances: jnp.ndarray,
    kappas: jnp.ndarray,
    constraints: SpeedProfileConstraints,
    axis_name: str,
    v_max_runtime: jnp.ndarray | float | None = None,
    localised: jnp.ndarray | bool = False,
    use_end_velocity: bool = False,
) -> jnp.ndarray:
    """Exact map-scale speed profile with the horizon sharded over a mesh
    axis (BASELINE's "per-block QP reductions combined via ICI
    collectives", production path).

    ``use_end_velocity`` defaults OFF here (unlike the single-device
    solve): the pin lands on the last device's last LOCAL element, which
    is a synthetic waypoint whenever the caller padded the horizon to a
    device multiple. Only enable it when the global point count divides
    the mesh axis exactly.

    Runs inside ``shard_map``; each device holds a contiguous slab of
    ``M`` waypoints. ``distances[..., j]`` is the arc length of the edge
    LEAVING local waypoint j (the last one crosses into the next block —
    the ReferencePath convention), so the only cross-device data needed
    is each predecessor's final edge, fetched with one ``ppermute``;
    the scans themselves combine through 2-float block summaries (see
    ``_min_plus_scan_sharded``). Returns the local slab of velocities.
    """
    dtype = jnp.asarray(distances).dtype
    if v_max_runtime is None:
        v_max_runtime = constraints.v_max
    v_max_runtime = jnp.asarray(v_max_runtime, dtype)

    idx = jax.lax.axis_index(axis_name)
    n_dev = jax.lax.psum(1, axis_name)
    big = jnp.asarray(jnp.inf, dtype)

    # local bounds; the global end-velocity pin lands on the LAST device
    end_vel = constraints.end_velocity if use_end_velocity else None
    v_hi_std = velocity_upper_bounds(kappas, constraints, v_max_runtime, None)
    if end_vel is not None:
        pin = (idx == n_dev - 1)
        v_hi_std = v_hi_std.at[..., -1].set(
            jnp.where(pin, jnp.asarray(end_vel, dtype), v_hi_std[..., -1])
        )
    v_hi_loc = jnp.ones_like(v_hi_std) * v_max_runtime
    v_hi = jnp.where(jnp.asarray(localised), v_hi_loc, v_hi_std)

    # predecessor's final edge (one ppermute right-shift across the axis)
    last_d = distances[..., -1]
    prev_last_d = jax.lax.ppermute(
        last_d, axis_name, [(i, i + 1) for i in range(n_dev - 1)]
    )

    # forward pass: slack entering local j is the edge leaving j-1
    fwd = 2.0 * constraints.a_max * distances
    fwd_in = jnp.concatenate(
        [
            jnp.where(idx == 0, big, 2.0 * constraints.a_max * prev_last_d)[
                ..., None
            ],
            fwd[..., :-1],
        ],
        axis=-1,
    )
    forward = _min_plus_scan_sharded(v_hi, fwd_in, axis_name)

    # backward pass = forward scan on flipped data with reversed block
    # order; the flipped block's incoming edge is its OWN final edge
    bwd = -2.0 * constraints.a_min * distances
    bwd_in = jnp.concatenate(
        [
            jnp.where(idx == n_dev - 1, big, bwd[..., -1])[..., None],
            jnp.flip(bwd[..., :-1], -1),
        ],
        axis=-1,
    )
    backward = jnp.flip(
        _min_plus_scan_sharded(
            jnp.flip(v_hi, -1), bwd_in, axis_name, reverse_blocks=True
        ),
        -1,
    )
    return jnp.minimum(forward, backward)


def solve_speed_profile(
    distances: jnp.ndarray,
    kappas: jnp.ndarray,
    constraints: SpeedProfileConstraints,
    v_max_runtime: jnp.ndarray | float | None = None,
    localised: jnp.ndarray | bool = False,
    use_end_velocity: bool = True,
    cfg: ADMMConfig = ADMMConfig(),
    v0: jnp.ndarray | None = None,
) -> SpeedProfileSolution:
    """Exact speed-profile solve in O(log N) — no iterative QP at all.

    The reference QP (speed_profile.py:11-86) has P = I and q = -v_hi with
    the same v_hi as the upper box bound, i.e. it *projects* v_hi onto
    {v : a_min <= D1 v <= a_max, v_lo <= v <= v_hi}. Difference-constraint
    sets are lattices (closed under pointwise min/max), so the projection
    of an upper-bounding point is the componentwise-greatest feasible
    point:

        v* = min(v_hi, forward a_max-limited pass, backward a_min pass)

    Both passes are (min,+) prefix recurrences computed exactly by
    `lax.associative_scan`. This replaces the reference's 4k-40k OSQP
    iteration caps with ~2 log2(N) vector steps, and is exact rather than
    1e-3-approximate. ``cfg``/``v0`` are kept for API compatibility (the
    ADMM variant below uses them).

    jit-compatible; batch with vmap. ``localised`` may be a traced bool
    (both bound variants are cheap; selected with `where`).
    """
    dtype = jnp.asarray(distances).dtype
    n = kappas.shape[-1]
    if v_max_runtime is None:
        v_max_runtime = constraints.v_max
    v_max_runtime = jnp.asarray(v_max_runtime, dtype)

    end_vel = constraints.end_velocity if use_end_velocity else None
    v_hi_std = velocity_upper_bounds(kappas, constraints, v_max_runtime, end_vel)
    v_hi_loc = jnp.full((n,), 1.0, dtype) * v_max_runtime
    v_hi = jnp.where(jnp.asarray(localised), v_hi_loc, v_hi_std)

    d = distances[..., : n - 1]
    fwd_slack = 2.0 * d * constraints.a_max
    bwd_slack = -2.0 * d * constraints.a_min

    forward = _min_plus_scan(v_hi, fwd_slack)
    backward = jnp.flip(
        _min_plus_scan(jnp.flip(v_hi, -1), jnp.flip(bwd_slack, -1)), -1
    )
    v = jnp.minimum(forward, backward)

    # Feasibility: impossible only if the accel band cannot bridge the
    # caps above v_lo (e.g. a_max <= 0 in a pathological config).
    feasible = jnp.all(v >= constraints.v_min - 1e-4)
    status = jnp.where(feasible, STATUS_SOLVED, STATUS_MAX_ITER)
    zero = jnp.zeros((), dtype)
    return SpeedProfileSolution(
        velocities=v,
        status=status,
        iterations=jnp.asarray(0, jnp.int32),
        r_prim=zero,
        r_dual=zero,
    )


def solve_speed_profile_admm_sharded(
    distances: jnp.ndarray,
    kappas: jnp.ndarray,
    constraints: SpeedProfileConstraints,
    axis_name: str,
    v_max_runtime: jnp.ndarray | float | None = None,
    localised: jnp.ndarray | bool = False,
    use_end_velocity: bool = True,
    cfg: ADMMConfig = ADMMConfig(),
    v0: jnp.ndarray | None = None,
) -> SpeedProfileSolution:
    """Map-scale speed-profile ADMM with the horizon sharded over a mesh
    axis — the general iterative engine behind the exact sharded scan
    (kept for cost structures that stop being a projection), and the
    full demonstration of BASELINE's "per-block QP reductions combined
    via ICI collectives":

    * the x-update solves the GLOBAL tridiagonal KKT system with the
      SPIKE scheme (ops/tridiag_sharded.py) — local PCR reduction, one
      6-float all_gather, replicated interface solve;
    * the constraint operator exchanges a 1-element halo per side via
      `ppermute` (the acceleration rows couple neighbouring slabs);
    * residual norms combine with `pmax`, so every device sees the same
      convergence decision and the while_loop stays in lockstep.

    Runs inside ``shard_map``. Local layout as in
    ``solve_speed_profile_sharded``. Returns the LOCAL slab of
    velocities plus replicated status/iterations/residuals.
    """
    dtype = jnp.asarray(distances).dtype
    m = kappas.shape[-1]
    if v_max_runtime is None:
        v_max_runtime = constraints.v_max
    v_max_runtime = jnp.asarray(v_max_runtime, dtype)

    idx = jax.lax.axis_index(axis_name)
    n_dev = jax.lax.psum(1, axis_name)
    fwd_perm = [(i, i + 1) for i in range(n_dev - 1)]  # to the right
    bwd_perm = [(i + 1, i) for i in range(n_dev - 1)]  # to the left

    def from_prev(x, fill=0.0):
        got = jax.lax.ppermute(x, axis_name, fwd_perm)
        return jnp.where(idx == 0, jnp.asarray(fill, dtype), got)

    def from_next(x, fill=0.0):
        got = jax.lax.ppermute(x, axis_name, bwd_perm)
        return jnp.where(idx == n_dev - 1, jnp.asarray(fill, dtype), got)

    def gmax(x):
        return jax.lax.pmax(jnp.max(x), axis_name)

    end_vel = constraints.end_velocity if use_end_velocity else None
    v_hi_std = velocity_upper_bounds(kappas, constraints, v_max_runtime, None)
    if end_vel is not None:
        v_hi_std = v_hi_std.at[..., -1].set(
            jnp.where(
                idx == n_dev - 1,
                jnp.asarray(end_vel, dtype),
                v_hi_std[..., -1],
            )
        )
    v_hi_loc = jnp.ones_like(v_hi_std) * v_max_runtime
    v_hi = jnp.where(jnp.asarray(localised), v_hi_loc, v_hi_std)
    v_lo = jnp.full((m,), constraints.v_min, dtype)
    # one acceleration row per local waypoint; the global last edge does
    # not exist — mask its weight to zero (the row becomes 0 in [lo, hi])
    a_lo = jnp.full((m,), constraints.a_min, dtype)
    a_hi = jnp.full((m,), constraints.a_max, dtype)
    q = -v_hi

    inv2d = 1.0 / (2.0 * distances)
    inv2d = inv2d.at[..., -1].set(
        jnp.where(idx == n_dev - 1, 0.0, inv2d[..., -1])
    )

    def A_mul(v):
        v_next = jnp.concatenate(
            [v[..., 1:], from_next(v[..., 0])[..., None]], axis=-1
        )
        return (v_next - v) * inv2d, v

    def AT_mul(w_acc, w_vel):
        g = -w_acc * inv2d
        w_in = from_prev(w_acc[..., -1] * inv2d[..., -1])
        g = g + jnp.concatenate(
            [w_in[..., None], (w_acc * inv2d)[..., :-1]], axis=-1
        )
        return g + w_vel

    sigma = jnp.asarray(cfg.sigma, dtype)
    alpha = cfg.alpha

    def K_parts(rho):
        w = inv2d**2
        w_prev = jnp.concatenate(
            [from_prev(w[..., -1])[..., None], w[..., :-1]], axis=-1
        )
        diag = 1.0 + sigma + rho + rho * (w + w_prev)
        sup = -rho * w  # entry (j, j+1); last is the cross-block coupling
        sub = -rho * w_prev  # entry (j, j-1); first crosses blocks
        return sub, diag, sup

    x = jnp.zeros((m,), dtype) if v0 is None else jnp.asarray(v0, dtype)
    za, zv = A_mul(x)
    za = jnp.clip(za, a_lo, a_hi)
    zv = jnp.clip(zv, v_lo, v_hi)
    ya = jnp.zeros_like(za)
    yv = jnp.zeros_like(zv)
    rho0 = jnp.asarray(cfg.rho, dtype)

    def residuals(x, za, zv, ya, yv):
        axa, axv = A_mul(x)
        r_prim = jnp.maximum(gmax(jnp.abs(axa - za)), gmax(jnp.abs(axv - zv)))
        aty = AT_mul(ya, yv)
        r_dual = gmax(jnp.abs(x + q + aty))
        ax_n = jnp.maximum(gmax(jnp.abs(axa)), gmax(jnp.abs(axv)))
        z_n = jnp.maximum(gmax(jnp.abs(za)), gmax(jnp.abs(zv)))
        eps_prim = cfg.eps_abs + cfg.eps_rel * jnp.maximum(ax_n, z_n)
        d_n = jnp.maximum(
            jnp.maximum(gmax(jnp.abs(x)), gmax(jnp.abs(aty))),
            gmax(jnp.abs(q)),
        )
        eps_dual = cfg.eps_abs + cfg.eps_rel * d_n
        converged = (r_prim <= eps_prim) & (r_dual <= eps_dual)
        prim_n = r_prim / jnp.maximum(jnp.maximum(ax_n, z_n), 1e-10)
        dual_n = r_dual / jnp.maximum(d_n, 1e-10)
        ratio = jnp.sqrt(prim_n / jnp.maximum(dual_n, 1e-10))
        return r_prim, r_dual, converged, ratio

    def chunk(x, za, zv, ya, yv, rho):
        sub, diag, sup = K_parts(rho)

        def one_iter(_, carry):
            x, za, zv, ya, yv = carry
            rhs = sigma * x - q + AT_mul(rho * za - ya, rho * zv - yv)
            xt = tridiag_solve_sharded(sub, diag, sup, rhs, axis_name)
            zta, ztv = A_mul(xt)
            x_new = alpha * xt + (1.0 - alpha) * x
            zra = alpha * zta + (1.0 - alpha) * za
            zrv = alpha * ztv + (1.0 - alpha) * zv
            za_new = jnp.clip(zra + ya / rho, a_lo, a_hi)
            zv_new = jnp.clip(zrv + yv / rho, v_lo, v_hi)
            ya_new = ya + rho * (zra - za_new)
            yv_new = yv + rho * (zrv - zv_new)
            return x_new, za_new, zv_new, ya_new, yv_new

        return jax.lax.fori_loop(
            0, cfg.check_every, one_iter, (x, za, zv, ya, yv)
        )

    def cond(state):
        return (~state[7]) & (state[6] < cfg.max_iter)

    def body(state):
        x, za, zv, ya, yv, rho, it, done, r_p, r_d = state
        x, za, zv, ya, yv = chunk(x, za, zv, ya, yv, rho)
        it = it + cfg.check_every
        r_p, r_d, converged, ratio = residuals(x, za, zv, ya, yv)
        if cfg.adaptive_rho:
            tol = cfg.adaptive_rho_tol
            need = (ratio > tol) | (ratio < 1.0 / tol)
            rho = jnp.where(
                need & ~converged, jnp.clip(rho * ratio, 1e-6, 1e6), rho
            )
        return (x, za, zv, ya, yv, rho, it, converged, r_p, r_d)

    init = (
        x,
        za,
        zv,
        ya,
        yv,
        rho0,
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
        jnp.asarray(jnp.inf, dtype),
        jnp.asarray(jnp.inf, dtype),
    )
    x, za, zv, ya, yv, rho, it, done, r_p, r_d = jax.lax.while_loop(
        cond, body, init
    )
    status = jnp.where(done, STATUS_SOLVED, STATUS_MAX_ITER)
    return SpeedProfileSolution(
        velocities=x, status=status, iterations=it, r_prim=r_p, r_dual=r_d
    )


def solve_speed_profile_admm(
    distances: jnp.ndarray,
    kappas: jnp.ndarray,
    constraints: SpeedProfileConstraints,
    v_max_runtime: jnp.ndarray | float | None = None,
    localised: jnp.ndarray | bool = False,
    use_end_velocity: bool = True,
    cfg: ADMMConfig = ADMMConfig(),
    v0: jnp.ndarray | None = None,
) -> SpeedProfileSolution:
    """Iterative (tridiagonal ADMM / PCR) solver for the same QP — kept as
    an independent cross-check of the exact scan solution and as the
    general engine if the cost structure ever stops being a projection.
    """
    dtype = jnp.asarray(distances).dtype
    n = kappas.shape[-1]
    if v_max_runtime is None:
        v_max_runtime = constraints.v_max
    v_max_runtime = jnp.asarray(v_max_runtime, dtype)

    end_vel = constraints.end_velocity if use_end_velocity else None
    v_hi_std = velocity_upper_bounds(kappas, constraints, v_max_runtime, end_vel)
    v_hi_loc = jnp.full((n,), 1.0, dtype) * v_max_runtime
    v_hi = jnp.where(jnp.asarray(localised), v_hi_loc, v_hi_std)
    v_lo = jnp.full((n,), constraints.v_min, dtype)
    a_lo = jnp.full((n - 1,), constraints.a_min, dtype)
    a_hi = jnp.full((n - 1,), constraints.a_max, dtype)
    q = -v_hi

    inv2d = 1.0 / (2.0 * distances[..., : n - 1])

    def A_mul(v):
        acc = (v[..., 1:] - v[..., :-1]) * inv2d
        return acc, v

    def AT_mul(w_acc, w_vel):
        g = jnp.zeros_like(w_vel)
        g = g.at[..., :-1].add(-w_acc * inv2d)
        g = g.at[..., 1:].add(w_acc * inv2d)
        return g + w_vel

    sigma = jnp.asarray(cfg.sigma, dtype)
    alpha = cfg.alpha

    def K_parts(rho):
        """Tridiagonal P + sigma*I + rho*(D1'D1 + I)."""
        w = inv2d**2
        diag = 1.0 + sigma + rho
        diag = diag + rho * jnp.concatenate([w, jnp.zeros_like(w[..., :1])], -1)
        diag = diag + rho * jnp.concatenate([jnp.zeros_like(w[..., :1]), w], -1)
        off = -rho * w  # entries (j, j+1), j = 0..n-2
        sup = jnp.concatenate([off, jnp.zeros_like(off[..., :1])], -1)
        sub = jnp.concatenate([jnp.zeros_like(off[..., :1]), off], -1)
        return sub, diag, sup

    x = jnp.zeros((n,), dtype) if v0 is None else jnp.asarray(v0, dtype)
    za, zv = A_mul(x)
    za = jnp.clip(za, a_lo, a_hi)
    zv = jnp.clip(zv, v_lo, v_hi)
    ya = jnp.zeros_like(za)
    yv = jnp.zeros_like(zv)
    rho0 = jnp.asarray(cfg.rho, dtype)

    def residuals(x, za, zv, ya, yv):
        Axa, Axv = A_mul(x)
        r_prim = jnp.maximum(
            jnp.max(jnp.abs(Axa - za)), jnp.max(jnp.abs(Axv - zv))
        )
        Aty = AT_mul(ya, yv)
        r_dual = jnp.max(jnp.abs(x + q + Aty))
        ax_n = jnp.maximum(jnp.max(jnp.abs(Axa)), jnp.max(jnp.abs(Axv)))
        z_n = jnp.maximum(jnp.max(jnp.abs(za)), jnp.max(jnp.abs(zv)))
        eps_prim = cfg.eps_abs + cfg.eps_rel * jnp.maximum(ax_n, z_n)
        d_n = jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(x)), jnp.max(jnp.abs(Aty))),
            jnp.max(jnp.abs(q)),
        )
        eps_dual = cfg.eps_abs + cfg.eps_rel * d_n
        converged = (r_prim <= eps_prim) & (r_dual <= eps_dual)
        prim_n = r_prim / jnp.maximum(jnp.maximum(ax_n, z_n), 1e-10)
        dual_n = r_dual / jnp.maximum(d_n, 1e-10)
        ratio = jnp.sqrt(prim_n / jnp.maximum(dual_n, 1e-10))
        return r_prim, r_dual, converged, ratio

    def chunk(x, za, zv, ya, yv, rho):
        sub, diag, sup = K_parts(rho)

        def one_iter(_, carry):
            x, za, zv, ya, yv = carry
            rhs = sigma * x - q + AT_mul(rho * za - ya, rho * zv - yv)
            xt = tridiag_solve(sub, diag, sup, rhs)
            zta, ztv = A_mul(xt)
            x_new = alpha * xt + (1.0 - alpha) * x
            zra = alpha * zta + (1.0 - alpha) * za
            zrv = alpha * ztv + (1.0 - alpha) * zv
            za_new = jnp.clip(zra + ya / rho, a_lo, a_hi)
            zv_new = jnp.clip(zrv + yv / rho, v_lo, v_hi)
            ya_new = ya + rho * (zra - za_new)
            yv_new = yv + rho * (zrv - zv_new)
            return x_new, za_new, zv_new, ya_new, yv_new

        return jax.lax.fori_loop(0, cfg.check_every, one_iter, (x, za, zv, ya, yv))

    def cond(state):
        return (~state[7]) & (state[6] < cfg.max_iter)

    def body(state):
        x, za, zv, ya, yv, rho, it, done, r_p, r_d = state
        x, za, zv, ya, yv = chunk(x, za, zv, ya, yv, rho)
        it = it + cfg.check_every
        r_p, r_d, converged, ratio = residuals(x, za, zv, ya, yv)
        if cfg.adaptive_rho:
            tol = cfg.adaptive_rho_tol
            need = (ratio > tol) | (ratio < 1.0 / tol)
            rho = jnp.where(
                need & ~converged, jnp.clip(rho * ratio, 1e-6, 1e6), rho
            )
        return (x, za, zv, ya, yv, rho, it, converged, r_p, r_d)

    init = (
        x,
        za,
        zv,
        ya,
        yv,
        rho0,
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
        jnp.asarray(jnp.inf, dtype),
        jnp.asarray(jnp.inf, dtype),
    )
    x, za, zv, ya, yv, rho, it, done, r_p, r_d = jax.lax.while_loop(
        cond, body, init
    )
    status = jnp.where(done, STATUS_SOLVED, STATUS_MAX_ITER)
    return SpeedProfileSolution(
        velocities=x, status=status, iterations=it, r_prim=r_p, r_dual=r_d
    )
