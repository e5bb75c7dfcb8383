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

Three deliberate accuracy fixes over the reference (measured on the
LOCBENCH replays — see docs/LOCALISATION.md for the full diagnosis):

1. the map slice starts at the particle's nearest index PLUS the
   observation's visible-start offset (update()'s left_start/right_start,
   measured by Localiser._prepare), so the point-for-point pairing is not
   biased by the camera's near-field blind distance;
2. a TWO-PHASE likelihood: while searching (not converged) the filter
   scores with the reference's broad fixed sigma so geometric aliases
   die by driving rather than win by sharpness; once converged, sigma is
   calibrated to the error quantile the population actually achieves
   (update(): sigma_eff = clip(1.5*q30, sigma_min, sigma)) — the
   reference's fixed sigma=10 over sub-metre errors flattens the
   likelihood ~30x and the pose estimate free-wheels ~12 m off;
3. systematic resampling with adaptive shrinking jitter fires on ESS
   collapse whether or not the filter is converged (_resample) — the
   reference concentrates only through particle deaths, so on a clean
   stream its converged cloud diffuses under control noise forever.

Measured effect (2,401-step LOCBENCH replays, steady state = last half):
nordschleife 13.6 m -> 1.3 m, monza 4.6 m -> 1.4 m, spa 6.2 m -> 1.9 m
mean position error; steady-state localised 98.5-100%.
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
    # -- likelihood calibration (round-4 accuracy work; see update()) ----
    adaptive_sigma: bool = True
    sigma_min: float = 0.5
    adaptive_sigma_scale: float = 1.5
    sharpen_spread_m: float = 150.0  # single-basin gate for sharpening
    # score against the map centreline as a third curve (the reference
    # keeps 3 KD-trees — left/right/centre, localiser.py:645-650 — but
    # scores limits only; the centre observation is the midpoint of
    # index-aligned boundary pairs, so it averages the extraction's
    # per-boundary noise and adds an independent pairing constraint)
    score_centreline: bool = False
    # -- resampling jitter floors (adaptive shrinking jitter; _resample) -
    jitter_floor_xy: float = 0.05
    jitter_floor_yaw: float = 0.004  # ~0.23 degrees
    ess_fraction: float = 0.5
    # -- observation-guided (re)seeding (round-5 time-to-first-fix) ------
    # Instead of seeding the whole-track prior blind (reference
    # localiser.py:468-484) and waiting for driving to kill every alias,
    # run a SHAPE-SEQUENCE SCAN: for the first ``seed_scan_frames``
    # observations after a reset, score EVERY candidate map basin
    # against the observation (one matmul-shaped sweep over ~
    # seed_max_candidates strided centreline poses, each candidate
    # ADVANCED along the centreline by the distance actually driven
    # since the reset), accumulate the per-frame log-likelihoods, then
    # draw the seed population from the accumulated distribution.
    # DEFAULT OFF — measured NET NEGATIVE (round 5). Two failure modes:
    # single-frame seeding mis-ranks basins catastrophically on noisy
    # real-perception streams (locked monza_realperc 830 m off on 4/5
    # seeds), and even multi-frame accumulation is systematically
    # anti-truth: candidates are pinned to the centreline with exact
    # track yaw while the real car corner-cuts 1-2 m off it, so on
    # straight-dominated tracks a long-straight alias pairs any
    # near-straight observation sub-metre for many consecutive frames
    # and the true basin's fixed offset handicap makes its posterior
    # mass DECAY with more evidence (monza_synth 64-frame scan:
    # mass_true 0.009 -> 0.000 while a wrong basin accumulated 0.24).
    # Driving-based alias culling — the reference's mechanism, kept
    # here — discriminates better because the particles carry lateral/
    # yaw state the candidates lack. The machinery stays config-gated
    # for sparse-feature tracks where it may yet help.
    seed_from_observation: bool = False
    seed_max_candidates: int = 4096
    seed_sigma: float = 5.0  # per-frame candidate sigma (m pairing error)
    seed_uniform_fraction: float = 0.2
    seed_scan_frames: int = 8
    # -- fit-quality gate on the localised flag (round-5 over-confidence
    # fix): a tight-but-displaced cloud passes the reference's
    # spread-only convergence test (localiser.py:561-570) while pairing
    # metres off; requiring the population's achieved error (30th
    # percentile, the adaptive-sigma statistic) to stay under this bound
    # makes the flag honest. 0 disables.
    localised_max_error: float = 0.0
    # -- MASS-based convergence (round-5): the reference's max-spread
    # test requires every alias particle to DIE before the flag rises —
    # but with observation-guided seeding nothing dies (all seeds start
    # at plausible fits under the generous 25 m validity bar), so a
    # filter holding 98% of its posterior mass on the true basin stays
    # "unconverged" for a whole lap (measured on vallelunga: est_err
    # 9.5 m at step 900, flag down until step 2574). Converged instead
    # when >= this fraction of posterior mass lies within
    # convergence_distance (and convergence_angle) of the estimate; the
    # same dominance signal engages sigma sharpening, which collapses
    # the winning basin and starves the aliases. 0 restores the
    # reference's max-spread semantics.
    convergence_mass: float = 0.97
    # sharpening engagement bar (round-5): the dominance mass at which
    # sigma calibration switches on, deliberately LOWER than
    # convergence_mass. Measured on silverstone: the cloud equilibrates
    # as a ~170 m worm holding 0.80-0.95 of the mass — just under the
    # 0.97 convergence bar and just over the 150 m spread gate — for
    # 1200+ steps; at 4:1 posterior odds the filter should commit and
    # let the calibrated sigma collapse the winning basin (a wrong
    # commitment is caught by the fit gate + validity culling + seeded
    # re-reset).
    sharpen_mass: float = 0.8

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
            adaptive_sigma=cfg.adaptive_sigma,
            sigma_min=cfg.sigma_min,
            sharpen_spread_m=cfg.sharpen_spread_m,
            score_centreline=cfg.score_centreline,
            seed_from_observation=cfg.seed_from_observation,
            seed_max_candidates=cfg.seed_max_candidates,
            seed_sigma=cfg.seed_sigma,
            seed_uniform_fraction=cfg.seed_uniform_fraction,
            seed_scan_frames=cfg.seed_scan_frames,
            localised_max_error=cfg.localised_max_error,
            convergence_mass=cfg.convergence_mass,
            sharpen_mass=cfg.sharpen_mass,
            observation_forward_limit=cfg.observation_forward_limit,
            max_observation_points=cfg.max_observation_points,
        )


@struct.dataclass
class PFState:
    states: jnp.ndarray  # (N, 3): x, y, yaw
    scores: jnp.ndarray  # (N,)
    valid: jnp.ndarray  # (N,) bool
    converged: jnp.ndarray  # bool
    previously_converged: jnp.ndarray  # bool
    key: jnp.ndarray  # PRNG key
    seeded: jnp.ndarray  # bool: has an observation-guided seed happened
    fit_error: jnp.ndarray  # last 30th-percentile valid pairing error (m)
    # shape-sequence scan accumulators (zeroed on every reset; only
    # meaningful while seeded is False — see PFConfig seed_scan_frames)
    cand_logw: jnp.ndarray  # (C,) accumulated candidate log-likelihood
    seed_obs_count: jnp.ndarray  # i32: observations scanned so far
    cand_shift_m: jnp.ndarray  # f32: metres driven since the reset


class ParticleFilter:
    """Pure-functional particle filter bound to one (config, map) pair.
    All methods are jit/vmap compatible."""

    def __init__(
        self, config: PFConfig, track_map: TrackMap, wheelbase: float = 2.65
    ):
        self.config = config
        self.map = track_map
        self._wheelbase = wheelbase
        self._seed_cache = None

    def _seed_tables(self):
        """Static tables for the shape-sequence seeding scan: a pose and
        nearest left/right boundary index PER CENTRELINE INDEX (full
        resolution, so candidates can be advanced by the driven distance
        at map granularity), plus the candidate stride. Computed once per
        (config, map) on the host (scipy cKDTree — construction-time
        work, not in the jitted path)."""
        if self._seed_cache is None:
            import numpy as np
            from scipy.spatial import cKDTree

            centre = np.asarray(self.map.centre, np.float64)
            m = len(centre)
            stride = max(
                1, int(np.ceil(m / self.config.seed_max_candidates))
            )
            p1 = np.roll(centre, -1, axis=0)
            yaw = np.arctan2(
                p1[:, 1] - centre[:, 1], p1[:, 0] - centre[:, 0]
            )
            poses = np.concatenate(
                [centre, yaw[:, None]], axis=1
            ).astype(np.float32)
            left_idx = cKDTree(np.asarray(self.map.left, np.float64)).query(
                centre
            )[1]
            right_idx = cKDTree(
                np.asarray(self.map.right, np.float64)
            ).query(centre)[1]
            # cache NUMPY arrays: converting to jnp inside a jit trace
            # would cache per-trace tracers and leak them into the next
            # trace; jnp.asarray at the use site stages a fresh constant
            # into whichever program is being traced
            self._seed_cache = (
                poses,
                left_idx.astype(np.int32),
                right_idx.astype(np.int32),
                stride,
            )
        poses, left_idx, right_idx, stride = self._seed_cache
        return (
            jnp.asarray(poses),
            jnp.asarray(left_idx),
            jnp.asarray(right_idx),
            stride,
        )

    @property
    def n_candidates(self) -> int:
        m = self.map.centre.shape[0]
        stride = max(1, -(-m // self.config.seed_max_candidates))
        return -(-m // stride)

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
            seeded=jnp.asarray(False),
            fit_error=jnp.asarray(jnp.inf, jnp.float32),
            cand_logw=jnp.zeros((self.n_candidates,), jnp.float32),
            seed_obs_count=jnp.asarray(0, jnp.int32),
            cand_shift_m=jnp.asarray(0.0, jnp.float32),
        )

    # ------------------------------------------------------------------
    def _candidate_indices(self, cand_shift_m):
        """Current centreline index of every scan candidate: its reset
        index advanced by the distance driven since the reset."""
        m = self.map.centre.shape[0]
        _, _, _, stride = self._seed_tables()
        shift = jnp.round(
            cand_shift_m / jnp.maximum(self.map.average_spacing, 1e-6)
        ).astype(jnp.int32)
        return jnp.mod(
            jnp.arange(self.n_candidates, dtype=jnp.int32) * stride + shift,
            m,
        )

    def _cand_frame_logscore(
        self,
        cand_shift_m,
        obs_left,
        obs_left_mask,
        obs_right,
        obs_right_mask,
        left_start,
        right_start,
    ):
        """One scan frame: log-likelihood of the observation under every
        candidate pose (the same pairing math as update(), batched over
        ~seed_max_candidates poses instead of n_particles)."""
        cfg = self.config
        poses, left_align, right_align, _ = self._seed_tables()
        idx = self._candidate_indices(cand_shift_m)
        cand_states = poses[idx]  # (C, 3)
        cand_left = left_align[idx]
        cand_right = right_align[idx]
        p = obs_left.shape[0]

        obs = jnp.concatenate([obs_left, obs_right], axis=0)  # (2P, 2)
        obs_mask = jnp.concatenate([obs_left_mask, obs_right_mask], axis=0)

        angle = -cand_states[:, 2] + jnp.pi / 2
        cos, sin = jnp.cos(angle), jnp.sin(angle)
        rot = jnp.stack(
            [jnp.stack([cos, sin], -1), jnp.stack([-sin, cos], -1)], -2
        )  # (C, 2, 2)
        obs_world = (
            jnp.einsum("cij,pj->cpi", rot, obs) + cand_states[:, None, :2]
        )  # (C, 2P, 2)
        seq = jnp.arange(p)
        ml, mr = self.map.left.shape[0], self.map.right.shape[0]
        left_slice = self.map.left[
            jnp.mod(cand_left[:, None] + left_start + seq[None, :], ml)
        ]
        right_slice = self.map.right[
            jnp.mod(cand_right[:, None] + right_start + seq[None, :], mr)
        ]
        limits = jnp.concatenate([left_slice, right_slice], axis=1)
        err = jnp.linalg.norm(obs_world - limits, axis=2)  # (C, 2P)
        denom = jnp.maximum(jnp.sum(obs_mask), 1)
        mean_err = jnp.sum(err * obs_mask[None, :], axis=1) / denom  # (C,)
        return -0.5 * (mean_err / cfg.seed_sigma) ** 2

    def _draw_from_candidates(self, state: PFState, key, logw) -> PFState:
        """Draw the seed population from the accumulated scan
        distribution (at the candidates' CURRENT — advanced — poses),
        with a ``seed_uniform_fraction`` blind floor (the reference's
        whole-track prior, localiser.py:468-484) so a garbage scan can
        never leave the true basin unpopulated."""
        cfg = self.config
        poses, _, _, _ = self._seed_tables()
        idx = self._candidate_indices(state.cand_shift_m)
        cand_states = poses[idx]
        c = self.n_candidates

        w = jnp.exp(logw - jnp.max(logw))
        wsum = jnp.sum(w)
        w = jnp.where(wsum > 1e-20, w / jnp.maximum(wsum, 1e-30), 1.0 / c)

        n = cfg.n_particles
        n_uniform = int(round(n * cfg.seed_uniform_fraction))
        n_guided = n - n_uniform

        k1, k2 = jax.random.split(key)
        # systematic draw of guided seeds over the candidate weights
        cum = jnp.cumsum(w)
        u = (jnp.arange(n_guided) + jax.random.uniform(k1)) / n_guided
        draw = jnp.clip(jnp.searchsorted(cum, u, side="right"), 0, c - 1)
        guided = cand_states[draw]
        # uniform floor: evenly spaced candidates (the blind prior)
        step = max(1, c // max(n_uniform, 1))
        uniform = cand_states[(jnp.arange(n_uniform) * step) % jnp.asarray(c)]
        states = jnp.concatenate([guided, uniform], axis=0)
        jit_sigma = jnp.asarray(
            [cfg.sampling_noise_x, cfg.sampling_noise_y, cfg.sampling_noise_yaw]
        )
        states = states + jax.random.normal(k2, (n, 3)) * jit_sigma[None, :]
        return PFState(
            states=states,
            scores=jnp.full((n,), 1.0 / n),
            valid=jnp.ones((n,), bool),
            converged=jnp.asarray(False),
            previously_converged=state.previously_converged,
            key=state.key,
            seeded=jnp.asarray(True),
            fit_error=jnp.asarray(jnp.inf, jnp.float32),
            cand_logw=jnp.zeros((c,), jnp.float32),
            seed_obs_count=jnp.asarray(0, jnp.int32),
            cand_shift_m=jnp.asarray(0.0, jnp.float32),
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
        return state.replace(
            states=state.states + x_dot * dt,
            key=key,
            # advance the seeding-scan candidates by the driven distance
            # (only read while seeded is False)
            cand_shift_m=state.cand_shift_m
            + jnp.abs(jnp.asarray(velocity, jnp.float32)) * dt,
        )

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
        obs_centre: jnp.ndarray | None = None,  # (P, 2) optional 3rd curve
        obs_centre_mask: jnp.ndarray | None = None,
        centre_start: jnp.ndarray | int = 0,
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

        # forward crop (localiser.py:339-340)
        obs_left_mask = obs_left_mask & (obs_left[:, 1] < cfg.observation_forward_limit)
        obs_right_mask = obs_right_mask & (
            obs_right[:, 1] < cfg.observation_forward_limit
        )

        if cfg.seed_from_observation:
            # shape-sequence seeding scan (PFConfig.seed_scan_frames):
            # while unseeded, fold this observation into the candidate
            # log-likelihoods; on the final scan frame, replace the blind
            # prior population with the accumulated-distribution draw
            # BEFORE scoring, so the new seeds are scored immediately.
            # lax.cond keeps the candidate sweep off the steady-state
            # path.
            key0, seed_key0 = jax.random.split(state.key)

            def scan_step(st: PFState) -> PFState:
                logw = st.cand_logw + self._cand_frame_logscore(
                    st.cand_shift_m,
                    obs_left,
                    obs_left_mask,
                    obs_right,
                    obs_right_mask,
                    left_start,
                    right_start,
                )
                logw = logw - jnp.max(logw)
                cnt = st.seed_obs_count + 1
                return jax.lax.cond(
                    cnt >= cfg.seed_scan_frames,
                    lambda s: self._draw_from_candidates(s, seed_key0, logw),
                    lambda s: s.replace(cand_logw=logw, seed_obs_count=cnt),
                    st,
                )

            state = jax.lax.cond(
                state.seeded,
                lambda st: st,
                scan_step,
                state.replace(key=key0),
            )
        states = state.states

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

        use_centre = obs_centre is not None  # static: two jit variants
        if use_centre:
            obs_centre_mask = obs_centre_mask & (
                obs_centre[:, 1] < cfg.observation_forward_limit
            )
            obs = jnp.concatenate([obs_left, obs_right, obs_centre], axis=0)
            obs_mask = jnp.concatenate(
                [obs_left_mask, obs_right_mask, obs_centre_mask], axis=0
            )
        else:
            obs = jnp.concatenate([obs_left, obs_right], axis=0)  # (2P, 2)
            obs_mask = jnp.concatenate([obs_left_mask, obs_right_mask], axis=0)
        obs_world = (
            jnp.einsum("nij,pj->npi", rot, obs) + locs[:, None, :]
        )  # (N, 2P, 2) — or (N, 3P, 2) in the use_centre jit variant

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
        if use_centre:
            centre_slice = self.map.centre[
                jnp.mod(centre_idx[:, None] + centre_start + seq[None, :], mc)
            ]
            limits = jnp.concatenate(
                [left_slice, right_slice, centre_slice], axis=1
            )  # (N, 3P, 2)
        else:
            limits = jnp.concatenate(
                [left_slice, right_slice], axis=1
            )  # (N, 2P, 2)

        err = jnp.linalg.norm(obs_world - limits, axis=2)  # (N, 2P or 3P)
        denom = jnp.maximum(jnp.sum(obs_mask), 1)
        mean_err = jnp.sum(err * obs_mask[None, :], axis=1) / denom

        # validity thresholds (localiser.py:453-462)
        valid = (
            (heading_offset < cfg.threshold_rotation)
            & (centre_off < cfg.threshold_offset)
            & (mean_err < cfg.threshold_error)
            & state.valid
        )
        n_valid = jnp.sum(valid)

        # Likelihood calibration, gated on convergence (two-phase filter).
        #
        # SEARCH phase (not converged, prior still track-wide): score with
        # the reference's broad fixed sigma. A synthetic circuit is full
        # of geometric aliases — 50 m of boundary shape matches many other
        # places on the track to within a few metres — so any sharpened
        # likelihood lets the weight accumulation commit to an alias
        # before driving can prune it (measured in round 4: sharpening
        # during the transient locked monza 1.6 km off by step 240 with
        # 100% claimed confidence). With the broad sigma, wrong modes die
        # the reference's way instead: their pairing error crosses
        # threshold_error as the car's driven shape-sequence diverges from
        # theirs, which only the true mode matches indefinitely.
        #
        # TRACK phase (converged, cloud inside one <=50 m basin where the
        # error surface is unimodal and centred — measured with
        # tools/diag_errsurface.py): calibrate sigma to the error level
        # the population actually achieves, sigma_eff = clip(1.5 *
        # 30th-percentile valid error, sigma_min, sigma). The reference's
        # fixed sigma=10 over a sub-metre error floor flattens the
        # likelihood ~30x, so the weak along-track signal drowns in
        # per-particle yaw noise and the estimate free-wheels where the
        # transient left it (measured: locked ~12 m ahead of truth with
        # per-frame pairing errors ~6 m vs the 0.3 m achievable). The
        # low QUANTILE — not the minimum — keeps one lucky particle from
        # setting a razor sigma that exterminates its neighbours; it also
        # self-anneals on noisy real perception (floor of metres ->
        # relaxes back toward the reference's setting).
        e_min = jnp.min(jnp.where(valid, mean_err, jnp.inf))
        e_min = jnp.where(jnp.isfinite(e_min), e_min, cfg.score_sigma)
        # 30th-percentile valid pairing error: the adaptive-sigma
        # statistic, also kept in the state as the fit-quality signal
        # for the localised flag (_update_convergence)
        err_sorted = jnp.sort(jnp.where(valid, mean_err, jnp.inf))
        q_idx = jnp.clip(
            (0.3 * n_valid).astype(jnp.int32), 0, cfg.n_particles - 1
        )
        e_q_raw = err_sorted[q_idx]
        state = state.replace(fit_error=e_q_raw.astype(jnp.float32))
        if cfg.adaptive_sigma:
            e_q = jnp.where(jnp.isfinite(e_q_raw), e_q_raw, cfg.score_sigma)
            sigma_sharp = jnp.clip(
                cfg.adaptive_sigma_scale * e_q, cfg.sigma_min, cfg.score_sigma
            )
            # Sharpening gate: converged OR the whole valid cloud already
            # sits inside one spatial basin. The alias hazard that forces
            # the broad search sigma is CROSS-TRACK capture — aliases live
            # hundreds of metres to kilometres apart — so once every valid
            # particle is within sharpen_spread_m of the cloud mean, a
            # calibrated sigma can only contract within the basin, never
            # jump to an alias. Without this gate, smooth tracks deadlock:
            # the broad sigma equilibrates the cloud as a ~130 m
            # along-track worm (corners contract it, straights + jitter
            # re-diffuse it) that never passes the 50 m convergence test,
            # and the sharpening that would collapse it stays off forever
            # (measured on silverstone: 0% localised over a full lap,
            # spread pinned at ~130 m, ESS cycling at ~370/500). The gate
            # self-reverts: if the fit degrades, validity culls or spread
            # growth flips scoring back to the broad search sigma.
            denom_v = jnp.maximum(n_valid, 1)
            mu_v = (
                jnp.sum(jnp.where(valid[:, None], locs, 0.0), axis=0) / denom_v
            )
            spread_v = jnp.max(
                jnp.where(
                    valid,
                    jnp.linalg.norm(locs - mu_v, axis=1),
                    0.0,
                )
            )
            one_basin = spread_v < cfg.sharpen_spread_m
            if cfg.convergence_mass > 0:
                # mass dominance engages sharpening too: when the
                # incoming posterior already concentrates >= the
                # convergence mass inside one sharpen_spread_m basin,
                # calibrated sigma can only contract that basin — and
                # starves the surviving low-mass aliases at ~3x/frame
                # instead of the broad sigma's ~1.03x (the vallelunga
                # slosh, docstring of convergence_mass)
                w_in = jnp.where(valid, state.scores, 0.0)
                w_in = w_in / jnp.maximum(jnp.sum(w_in), 1e-30)
                mu_w = jnp.sum(w_in[:, None] * locs, axis=0)
                d_w = jnp.linalg.norm(locs - mu_w, axis=1)
                mass_near = jnp.sum(
                    jnp.where(d_w < cfg.sharpen_spread_m, w_in, 0.0)
                )
                one_basin = one_basin | (mass_near >= cfg.sharpen_mass)
            sigma_eff = jnp.where(
                state.converged | one_basin, sigma_sharp, cfg.score_sigma
            )
        else:
            sigma_eff = jnp.asarray(cfg.score_sigma)
        z = (mean_err - cfg.score_mean) / sigma_eff
        score = jnp.exp(-0.5 * z * z)  # per-particle likelihood (the
        # 1/(sigma sqrt(2pi)) factor is constant across particles and
        # cancels in the weight normalisation)

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
            # population collapse: back to the blind whole-track prior
            # (reference localiser.py:468-484). With seeding enabled the
            # reset also restarts the shape-sequence scan (reset() zeroes
            # the scan accumulators), so the next seed_scan_frames
            # observations re-derive the basin distribution instead of
            # trusting the single frame that just killed the population.
            return self.reset(reset_key).replace(
                previously_converged=state.previously_converged, key=key
            )

        def do_resample(_):
            return self._resample(state, resample_key, n_valid, e_min)

        state = jax.lax.cond(
            n_valid < cfg.threshold_min_particles, do_reset, do_resample, None
        )
        return self._update_convergence(state)

    # ------------------------------------------------------------------
    def _resample(self, state: PFState, key, n_valid, e_min) -> PFState:
        """Low-variance (systematic) resampling with adaptive shrinking
        jitter, plus the reference's dead-slot refill
        (localiser.py:486-545) — fixed-shape: compact survivors to the
        front, draw replacements by cumulative weight.

        Design vs the reference (round-4 accuracy work): the reference
        refills only dead slots, so it concentrates through particle
        DEATHS — which a clean observation stream never supplies; its
        converged cloud then diffuses under per-particle control noise
        forever (measured: per-frame pairing error drifted to ~6 m and
        the pose estimate locked ~12 m off). Here a full systematic
        resample fires whenever the effective sample size of the
        accumulated weights drops below ``ess_fraction`` of the valid
        population — converged or not — so selection continuously prunes
        noise-diffused particles. The jitter re-injected at each
        resample shrinks with the cloud: per-dimension
        clip(0.5*weighted_std + kappa*e_min, floor, config sampling
        noise), so a tight well-fitting cloud is not re-blurred to the
        reference's fixed 1.1 m / 3 deg, while a poorly-fitting one
        keeps searching. On flat-likelihood stretches (long straights —
        along-track genuinely unobservable) ESS stays high and nothing
        fires, exactly the reference's behaviour."""
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
        # systematic draw: one uniform offset, n evenly-spaced positions
        cum = jnp.cumsum(weights)
        u = (jnp.arange(n) + jax.random.uniform(k1)) / n
        draw = jnp.clip(jnp.searchsorted(cum, u, side="right"), 0, n - 1)

        # adaptive jitter: weighted cloud statistics (circular in yaw)
        mu_xy = jnp.sum(weights[:, None] * states_c[:, :2], axis=0)
        var_xy = jnp.sum(
            weights[:, None] * (states_c[:, :2] - mu_xy) ** 2, axis=0
        )
        cyaw = jnp.sum(weights * jnp.cos(states_c[:, 2]))
        syaw = jnp.sum(weights * jnp.sin(states_c[:, 2]))
        mu_yaw = jnp.arctan2(syaw, cyaw)
        dev = jnp.mod(states_c[:, 2] - mu_yaw + jnp.pi, 2 * jnp.pi) - jnp.pi
        var_yaw = jnp.sum(weights * dev**2)
        std = jnp.sqrt(
            jnp.concatenate([var_xy, var_yaw[None]]) + 1e-12
        )  # (3,)
        floor = jnp.asarray(
            [cfg.jitter_floor_xy, cfg.jitter_floor_xy, cfg.jitter_floor_yaw]
        )
        cap = jnp.asarray(
            [cfg.sampling_noise_x, cfg.sampling_noise_y, cfg.sampling_noise_yaw]
        )
        # kappa*e_min inflates the search when the fit is poor (wrong
        # along-track lock on a straight shows up as a rising floor)
        kappa = jnp.asarray([0.1, 0.1, 0.01])
        jit_sigma = jnp.clip(0.5 * std + kappa * e_min, floor, cap)
        noise = jax.random.normal(k2, (n, 3)) * jit_sigma[None, :]

        slot = jnp.arange(n)
        ess = 1.0 / jnp.maximum(jnp.sum(weights**2), 1e-30)
        resample_all = ess < cfg.ess_fraction * n_valid
        is_survivor = (slot < n_valid) & ~resample_all
        resampled = states_c[draw] + noise
        new_states = jnp.where(is_survivor[:, None], states_c, resampled)
        # resampled slots restart at a uniform weight share: the draw
        # already encodes the accumulated evidence, and copying the
        # parent's weight onto duplicates would double-count it in every
        # subsequent posterior (both for full resamples and dead-slot
        # refills)
        new_scores = jnp.where(is_survivor, scores_c, 1.0 / n)
        desired = jnp.where(
            state.converged, cfg.n_converged_particles, cfg.n_particles
        )
        new_valid = slot < jnp.maximum(desired, n_valid)
        return state.replace(states=new_states, scores=new_scores, valid=new_valid)

    # ------------------------------------------------------------------
    def estimate(self, state: PFState) -> jnp.ndarray:
        """Score-weighted mean pose (reference localiser.py:572-579).
        Yaw is averaged circularly — a linear mean of angles is wrong by
        up to pi when the cloud straddles the +-pi wrap."""

        def wmean(w):
            wsum = jnp.maximum(jnp.sum(w), 1e-30)
            xy = jnp.sum(state.states[:, :2] * w[:, None], axis=0) / wsum
            c = jnp.sum(w * jnp.cos(state.states[:, 2])) / wsum
            s = jnp.sum(w * jnp.sin(state.states[:, 2])) / wsum
            return jnp.concatenate([xy, jnp.arctan2(s, c)[None]])

        w = jnp.where(state.valid, state.scores, 0.0)
        est = wmean(w)
        fallback = wmean(state.valid.astype(state.scores.dtype))
        return jnp.where(
            (jnp.sum(w) > 0) & jnp.all(jnp.isfinite(est)), est, fallback
        )

    def _update_convergence(self, state: PFState) -> PFState:
        """Max-spread convergence test (reference localiser.py:561-570),
        with the yaw deviation wrapped to (-pi, pi]."""
        cfg = self.config
        est = self.estimate(state)
        big = jnp.asarray(jnp.inf, state.states.dtype)
        d = jnp.where(
            state.valid,
            jnp.linalg.norm(state.states[:, :2] - est[:2], axis=1),
            -big,
        )
        dyaw = jnp.mod(state.states[:, 2] - est[2] + jnp.pi, 2 * jnp.pi) - jnp.pi
        a = jnp.where(state.valid, jnp.abs(dyaw), -big)
        if cfg.convergence_mass > 0:
            # mass-based test (see convergence_mass docstring): the
            # posterior, not the worst surviving particle, decides
            w = jnp.where(state.valid, state.scores, 0.0)
            w = w / jnp.maximum(jnp.sum(w), 1e-30)
            near = jnp.sum(
                jnp.where(d < cfg.convergence_distance, w, 0.0)
            )
            aligned = jnp.sum(
                jnp.where(jnp.abs(a) < cfg.convergence_angle, w, 0.0)
            )
            converged = (near >= cfg.convergence_mass) & (
                aligned >= cfg.convergence_mass
            )
        else:
            converged = (jnp.max(d) < cfg.convergence_distance) & (
                jnp.max(a) < cfg.convergence_angle
            )
        if cfg.localised_max_error > 0:
            # fit-quality gate (round-5 over-confidence fix): a tight
            # cloud whose pairing error stays high is a DISPLACED lock —
            # claiming localised would feed the agent a wrong map index
            # at full confidence (VERDICT r4 weak-item 3: an 11 m
            # along-track lock reported 100% localised on all seeds)
            converged = converged & (
                state.fit_error < cfg.localised_max_error
            )
        return state.replace(
            converged=converged,
            previously_converged=state.previously_converged | converged,
        )
