"""Monte-Carlo track localisation as a pure JAX particle filter.

TPU-native counterpart of the reference's LocalisationProcess
(/root/reference/src/acmpc/localisation/localiser.py:132-661). Design
changes from the reference, driven by the hardware:

* fixed particle count with a validity mask instead of variable-length
  shared arrays — static shapes for jit;
* KD-tree queries become brute-force distance argmins (track_map.py) —
  matmul-shaped, batched over all particles at once;
* the predict (motion) and update (scoring/resampling) steps are pure
  functions of an explicit PFState carry — no locks, no shared memory;
  the whole update is ONE jitted program;
* numpy RNG becomes explicit jax.random keys carried in the state.

Scoring semantics follow the reference: rotate the BEV track-limit
observation into each particle's world frame (localiser.py:330-353), slice
the map boundaries starting at each particle's nearest boundary indices
(:391-400), mean L2 error -> Gaussian score (:402-410), threshold validity
(:453-462), reset by re-seeding along the whole centreline when the
population collapses (:468-484), convergence by max spread (:561-570).
One deliberate fix over the reference: the map slice starts at the
particle's nearest index PLUS the observation's visible-start offset
(update()'s left_start/right_start, measured by Localiser._prepare), so
the point-for-point pairing is not biased by the camera's near-field
blind distance.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct

from acmpc_tpu.localise.track_map import TrackMap, nearest_point


@dataclasses.dataclass(frozen=True)
class PFConfig:
    n_particles: int = 500
    n_converged_particles: int = 500
    sampling_noise_x: float = 1.1
    sampling_noise_y: float = 1.1
    sampling_noise_yaw: float = 0.0524  # radians
    control_noise_velocity: float = 0.25
    control_noise_yaw: float = 0.0349  # radians
    threshold_offset: float = 10.0
    threshold_rotation: float = 1.5708  # radians
    threshold_min_particles: int = 20
    threshold_error: float = 20.0
    score_mean: float = 0.0
    score_sigma: float = 10.0
    convergence_distance: float = 50.0
    convergence_angle: float = 1.5708  # radians (reference compares radians
    # to a degree-valued config at localiser.py:566-570; we use radians)
    max_observation_points: int = 256  # static padded observation size
    observation_forward_limit: float = 50.0  # y < 50 crop (localiser.py:339)

    @classmethod
    def from_config(cls, cfg) -> "PFConfig":
        """From the typed LocalisationConfig (config/schema.py)."""
        import math

        d = math.pi / 180.0
        return cls(
            n_particles=cfg.n_particles,
            n_converged_particles=cfg.n_converged_particles,
            sampling_noise_x=cfg.sampling_noise_xy,
            sampling_noise_y=cfg.sampling_noise_xy,
            sampling_noise_yaw=cfg.sampling_noise_yaw_deg * d,
            control_noise_velocity=cfg.control_noise_velocity,
            control_noise_yaw=cfg.control_noise_yaw_deg * d,
            threshold_offset=cfg.threshold_offset,
            threshold_rotation=cfg.threshold_rotation_deg * d,
            threshold_min_particles=cfg.threshold_minimum_particles,
            threshold_error=cfg.threshold_track_limit,
            score_mean=cfg.score_mean,
            score_sigma=cfg.score_sigma,
            convergence_distance=cfg.convergence_max_distance,
            convergence_angle=cfg.convergence_max_angle_deg * d,
        )


@struct.dataclass
class PFState:
    states: jnp.ndarray  # (N, 3): x, y, yaw
    scores: jnp.ndarray  # (N,)
    valid: jnp.ndarray  # (N,) bool
    converged: jnp.ndarray  # bool
    previously_converged: jnp.ndarray  # bool
    key: jnp.ndarray  # PRNG key


def _gaussian_pdf(x, mean, sigma):
    z = (x - mean) / sigma
    return jnp.exp(-0.5 * z * z) / (sigma * jnp.sqrt(2.0 * jnp.pi))


class ParticleFilter:
    """Pure-functional particle filter bound to one (config, map) pair.
    All methods are jit/vmap compatible."""

    def __init__(
        self, config: PFConfig, track_map: TrackMap, wheelbase: float = 2.65
    ):
        self.config = config
        self.map = track_map
        self._wheelbase = wheelbase
        # normalise scores so a zero-error observation scores ~1
        # (reference localiser.py:655-661)
        self._score_scale = float(
            _gaussian_pdf(
                jnp.asarray(config.score_mean), config.score_mean, config.score_sigma
            )
        )

    # ------------------------------------------------------------------
    def reset(self, key) -> PFState:
        """Seed particles along the whole centreline
        (reference localiser.py:468-484)."""
        cfg = self.config
        m = self.map.centre.shape[0]
        idx = jnp.linspace(0, m - 3, cfg.n_particles).astype(jnp.int32)
        p0 = self.map.centre[idx]
        p1 = self.map.centre[idx + 1]
        yaw = jnp.arctan2(p1[:, 1] - p0[:, 1], p1[:, 0] - p0[:, 0])
        states = jnp.concatenate([p0, yaw[:, None]], axis=1)
        scores = jnp.full((cfg.n_particles,), 1.0 / cfg.n_particles)
        return PFState(
            states=states,
            scores=scores,
            valid=jnp.ones((cfg.n_particles,), bool),
            converged=jnp.asarray(False),
            previously_converged=jnp.asarray(False),
            key=key,
        )

    # ------------------------------------------------------------------
    def predict(
        self, state: PFState, tyre_angle, velocity, dt
    ) -> PFState:
        """Kinematic motion update with per-particle control noise
        (reference Localiser.step/_advance_particles, localiser.py:43-95)."""
        cfg = self.config
        key, k1, k2 = jax.random.split(state.key, 3)
        n = cfg.n_particles
        delta = tyre_angle + cfg.control_noise_yaw * jax.random.normal(k1, (n,))
        vel = jnp.abs(
            velocity + cfg.control_noise_velocity * jax.random.normal(k2, (n,))
        )
        phi = state.states[:, 2]
        # back-axle bicycle kinematics (localiser.py:88-95)
        x_dot = jnp.stack(
            [
                vel * jnp.cos(phi),
                vel * jnp.sin(phi),
                vel * jnp.tan(delta) / self._wheelbase,
            ],
            axis=1,
        )
        return state.replace(states=state.states + x_dot * dt, key=key)

    # ------------------------------------------------------------------
    def update(
        self,
        state: PFState,
        obs_left: jnp.ndarray,  # (P, 2) padded BEV left track limit
        obs_left_mask: jnp.ndarray,  # (P,) bool
        obs_right: jnp.ndarray,  # (P, 2)
        obs_right_mask: jnp.ndarray,
        left_start: jnp.ndarray | int = 0,  # slice-start offset (indices)
        right_start: jnp.ndarray | int = 0,
    ) -> PFState:
        """Score particles against a track-limit observation, threshold,
        resample/reset (reference _score_particles, localiser.py:234-239).

        ``left_start``/``right_start`` shift each boundary's map slice
        forward by the observation's visible-start distance (in map-index
        units, from Localiser._prepare) so the index-matched pairs line up
        with what the camera can actually see — the reference starts its
        slice at the particle's own nearest point (localiser.py:391-400),
        which biases scoring by the camera's near-field blind distance."""
        cfg = self.config
        states = state.states

        # forward crop (localiser.py:339-340)
        obs_left_mask = obs_left_mask & (obs_left[:, 1] < cfg.observation_forward_limit)
        obs_right_mask = obs_right_mask & (
            obs_right[:, 1] < cfg.observation_forward_limit
        )

        # nearest map points for every particle (localiser.py:273-289)
        locs = states[:, :2]
        centre_off, centre_idx = nearest_point(locs, self.map.centre)
        _, left_idx = nearest_point(locs, self.map.left)
        _, right_idx = nearest_point(locs, self.map.right)

        # heading offset vs local track direction (localiser.py:291-318)
        mc = self.map.centre.shape[0]
        p0 = self.map.centre[jnp.mod(centre_idx, mc - 1)]
        p1 = self.map.centre[jnp.mod(centre_idx + 1, mc - 1)]
        track_heading = jnp.arctan2(p1[:, 1] - p0[:, 1], p1[:, 0] - p0[:, 0])
        heading_offset = jnp.abs(
            jnp.mod(track_heading - states[:, 2] + jnp.pi, 2 * jnp.pi) - jnp.pi
        )

        # rotate the observation into each particle frame and translate
        # (localiser.py:330-353): world = R(pi/2 - yaw)^T @ obs + position
        angle = -states[:, 2] + jnp.pi / 2
        cos, sin = jnp.cos(angle), jnp.sin(angle)
        # inverse (transposed) rotation applied to BEV points
        rot = jnp.stack(
            [jnp.stack([cos, sin], -1), jnp.stack([-sin, cos], -1)], -2
        )  # (N, 2, 2) — transpose of R(angle)

        obs = jnp.concatenate([obs_left, obs_right], axis=0)  # (2P, 2)
        obs_mask = jnp.concatenate([obs_left_mask, obs_right_mask], axis=0)
        obs_world = (
            jnp.einsum("nij,pj->npi", rot, obs) + locs[:, None, :]
        )  # (N, 2P, 2)

        # wrap-indexed boundary slices matched point-for-point
        # (localiser.py:391-400)
        p = obs_left.shape[0]
        seq = jnp.arange(p)
        ml, mr = self.map.left.shape[0], self.map.right.shape[0]
        left_slice = self.map.left[
            jnp.mod(left_idx[:, None] + left_start + seq[None, :], ml)
        ]  # (N, P, 2)
        right_slice = self.map.right[
            jnp.mod(right_idx[:, None] + right_start + seq[None, :], mr)
        ]
        limits = jnp.concatenate([left_slice, right_slice], axis=1)  # (N, 2P, 2)

        err = jnp.linalg.norm(obs_world - limits, axis=2)  # (N, 2P)
        denom = jnp.maximum(jnp.sum(obs_mask), 1)
        mean_err = jnp.sum(err * obs_mask[None, :], axis=1) / denom

        score = (
            _gaussian_pdf(mean_err, cfg.score_mean, cfg.score_sigma)
            / self._score_scale
        )

        # validity thresholds (localiser.py:453-462)
        valid = (
            (heading_offset < cfg.threshold_rotation)
            & (centre_off < cfg.threshold_offset)
            & (mean_err < cfg.threshold_error)
            & state.valid
        )
        n_valid = jnp.sum(valid)

        # accumulate the posterior weight across observations (sequential
        # importance sampling) instead of the reference's per-frame score
        # overwrite (_update_particle_scores): one frame's likelihood
        # ratio between a true-pose particle and a plausible wrong one is
        # only ~2-4x at sigma=10, but it compounds — after ~10
        # observations the weights separate decisively, which both
        # sharpens the estimate and drives the ESS resampling trigger.
        # Accumulated in log space with a max-shift: the direct product
        # underflows fp32 within a handful of sharp-sigma frames, which
        # would silently reset the weights to uniform every few updates.
        logw = jnp.log(jnp.maximum(state.scores, 1e-30)) + jnp.log(
            jnp.maximum(score, 1e-30)
        )
        logw = jnp.where(valid, logw, -jnp.inf)
        logw = logw - jnp.max(jnp.where(valid, logw, -1e30))
        post = jnp.where(valid, jnp.exp(logw), 0.0)
        psum = jnp.sum(post)
        post = jnp.where(
            psum > 0,
            post / jnp.maximum(psum, 1e-30),
            valid / jnp.maximum(n_valid, 1),
        )
        state = state.replace(scores=post, valid=valid)

        key, reset_key, resample_key = jax.random.split(state.key, 3)
        state = state.replace(key=key)

        def do_reset(_):
            return self.reset(reset_key).replace(
                previously_converged=state.previously_converged, key=key
            )

        def do_resample(_):
            return self._resample(state, resample_key, n_valid)

        state = jax.lax.cond(
            n_valid < cfg.threshold_min_particles, do_reset, do_resample, None
        )
        return self._update_convergence(state)

    # ------------------------------------------------------------------
    def _resample(self, state: PFState, key, n_valid) -> PFState:
        """Keep survivors, top up with jittered copies sampled by score
        (reference localiser.py:486-545) — fixed-shape formulation: compact
        survivors to the front, fill the tail with categorical draws.

        One addition over the reference: when the effective sample size
        of the accumulated weights collapses below half the valid
        population, ALL slots are resampled (systematic SIR), not just
        the invalid tail. The reference's refill-only scheme converges
        through particle deaths, which real tracks and noisy real
        perception supply in volume; on a weakly discriminating
        observation stream (smooth synthetic circuits, oracle perception)
        almost nothing dies and refill-only never concentrates. The ESS
        trigger leaves flat-score regimes (long straights — along-track
        genuinely unobservable) untouched, where it degrades exactly to
        the reference behaviour."""
        cfg = self.config
        n = cfg.n_particles
        order = jnp.argsort(~state.valid, stable=True)
        states_c = state.states[order]
        scores_c = state.scores[order]
        valid_c = state.valid[order]

        weights = jnp.where(valid_c, scores_c, 0.0)
        wsum = jnp.sum(weights)
        uniform = jnp.full((n,), 1.0 / jnp.maximum(n_valid, 1)) * valid_c
        weights = jnp.where(wsum > 0, weights / jnp.maximum(wsum, 1e-30), uniform)

        k1, k2 = jax.random.split(key)
        draw = jax.random.categorical(
            k1, jnp.log(jnp.maximum(weights, 1e-30)), shape=(n,)
        )
        noise = (
            jax.random.normal(k2, (n, 3))
            * jnp.asarray(
                [cfg.sampling_noise_x, cfg.sampling_noise_y, cfg.sampling_noise_yaw]
            )[None, :]
        )
        slot = jnp.arange(n)
        ess = 1.0 / jnp.maximum(jnp.sum(weights**2), 1e-30)
        # only while unconverged: a converged cluster follows the
        # reference's refill-only scheme, so the sampling jitter is not
        # re-injected into every particle each time the ESS dips
        resample_all = (~state.converged) & (ess < 0.5 * n_valid)
        is_survivor = (slot < n_valid) & ~resample_all
        new_states = jnp.where(
            is_survivor[:, None], states_c, states_c[draw] + noise
        )
        # a full systematic resample restarts the accumulated weights at
        # uniform (the draw already encodes them — keeping the old weight
        # on a duplicated particle would double-count its evidence);
        # tail-refill keeps the reference's copy-the-score semantics
        new_scores = jnp.where(
            resample_all,
            1.0 / n,
            jnp.where(is_survivor, scores_c, scores_c[draw]),
        )
        desired = jnp.where(
            state.converged, cfg.n_converged_particles, cfg.n_particles
        )
        new_valid = slot < jnp.maximum(desired, n_valid)
        return state.replace(states=new_states, scores=new_scores, valid=new_valid)

    # ------------------------------------------------------------------
    def estimate(self, state: PFState) -> jnp.ndarray:
        """Score-weighted mean pose (reference localiser.py:572-579)."""
        w = jnp.where(state.valid, state.scores, 0.0)[:, None]
        wsum = jnp.sum(w)
        est = jnp.sum(state.states * w, axis=0) / jnp.maximum(wsum, 1e-30)
        fallback = jnp.sum(
            state.states * state.valid[:, None], axis=0
        ) / jnp.maximum(jnp.sum(state.valid), 1)
        return jnp.where((wsum > 0) & jnp.all(jnp.isfinite(est)), est, fallback)

    def _update_convergence(self, state: PFState) -> PFState:
        """Max-spread convergence test (reference localiser.py:561-570)."""
        cfg = self.config
        est = self.estimate(state)
        big = jnp.asarray(jnp.inf, state.states.dtype)
        d = jnp.where(
            state.valid,
            jnp.linalg.norm(state.states[:, :2] - est[:2], axis=1),
            -big,
        )
        a = jnp.where(state.valid, jnp.abs(state.states[:, 2] - est[2]), -big)
        converged = (jnp.max(d) < cfg.convergence_distance) & (
            jnp.max(a) < cfg.convergence_angle
        )
        return state.replace(
            converged=converged,
            previously_converged=state.previously_converged | converged,
        )
