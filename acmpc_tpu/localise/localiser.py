"""Host-side localiser facade.

Mirrors the agent-facing API of the reference Localiser
(/root/reference/src/acmpc/localisation/localiser.py:20-129): ``step()``
advances particles from the control input at wall-clock dt, track-limit
observations trigger scoring, and the agent reads ``is_localised`` /
``estimated_position`` / ``estimated_map_index``.

Where the reference runs scoring in a free-running OS process over shared
memory, this facade keeps the filter as an explicit PFState and dispatches
the jitted predict/update programs; the runtime shell (runtime/agent.py)
calls it from its worker thread. Observations are padded host-side to the
filter's static size after the reference's map-density downsampling
(localiser.py:241-253).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from acmpc_tpu.config.schema import LocalisationConfig
from acmpc_tpu.dynamics.vehicle import VehicleParams
from acmpc_tpu.localise.particle_filter import PFConfig, ParticleFilter
from acmpc_tpu.localise.track_map import TrackMap, load_track_map, nearest_point


class Localiser:
    def __init__(
        self,
        cfg: LocalisationConfig,
        track_map: TrackMap | str,
        vehicle: VehicleParams | None = None,
        seed: int = 0,
    ):
        if isinstance(track_map, str):
            track_map = load_track_map(track_map)
        self._vehicle = vehicle or VehicleParams()
        self._pf_config = PFConfig.from_config(cfg)
        if self._pf_config.score_centreline:
            import warnings

            warnings.warn(
                "localisation.score_distribution.centreline is enabled: "
                "measured to DEGRADE real-perception accuracy up to ~8x "
                "(see docs/LOCALISATION.md, 'Third-curve scoring'); it is "
                "shipped default-off for a reason.",
                stacklevel=2,
            )
        self._pf = ParticleFilter(
            self._pf_config, track_map, wheelbase=self._vehicle.wheelbase
        )
        self._state = self._pf.reset(jax.random.PRNGKey(seed))
        self._previous_timestamp = time.monotonic()
        self._avg_spacing = float(track_map.average_spacing)
        self._predict = jax.jit(self._pf.predict)
        self._update = jax.jit(self._pf.update)
        self._estimate = jax.jit(self._pf.estimate)
        self._nearest_centre = jax.jit(
            lambda p: nearest_point(p[None, :], self._pf.map.centre)[1][0]
        )

    # -- agent-facing API ------------------------------------------------
    @property
    def map(self) -> TrackMap:
        return self._pf.map

    @property
    def is_localised(self) -> bool:
        return bool(self._state.converged)

    @property
    def estimated_position(self) -> np.ndarray:
        return np.asarray(self._estimate(self._state))

    @property
    def estimated_map_index(self) -> int:
        pos = jnp.asarray(self.estimated_position[:2])
        return int(self._nearest_centre(pos))

    def reset(self, seed: int = 0):
        self._state = self._pf.reset(jax.random.PRNGKey(seed))

    def step(self, control_input, dt: float | None = None):
        """Advance particles from (steering, acceleration, velocity) — the
        reference's Localiser.step (localiser.py:43-52). The steering map
        converts the normalised input to a road-wheel angle, negated to the
        map frame convention."""
        if dt is None:
            now = time.monotonic()
            dt = now - self._previous_timestamp
            self._previous_timestamp = now
        tyre_angle = -self._vehicle.steering_angle(float(control_input[0]))
        velocity = float(control_input[2])
        self._state = self._predict(
            self._state,
            jnp.asarray(tyre_angle, jnp.float32),
            jnp.asarray(velocity, jnp.float32),
            jnp.asarray(dt, jnp.float32),
        )

    def observe_tracklimits(self, left: np.ndarray, right: np.ndarray):
        """Score particles against a BEV track-limit observation — the
        reference's _score_particles path (localiser.py:227, 234-239).

        When ``score_centreline`` is on, a third curve is scored against
        the map centreline (the reference keeps a centre KD-tree too,
        localiser.py:645-650): the observation is the midpoint of
        boundary pairs aligned in map-index space (point i of the left
        polyline sits ``sl + i`` map spacings ahead of the car, point j
        of the right ``sr + j``; pairs share a forward index), so it
        averages the two boundaries' independent extraction noise."""
        ln, sl = self._normalise(left)
        rn, sr = self._normalise(right)
        ol, ml = self._pad(ln)
        orr, mr = self._pad(rn)
        if self._pf_config.score_centreline:
            k0 = max(sl, sr)
            n = min(len(ln) - (k0 - sl), len(rn) - (k0 - sr))
            if n >= 2:
                cen = 0.5 * (
                    ln[k0 - sl : k0 - sl + n] + rn[k0 - sr : k0 - sr + n]
                )
                oc, mcm = self._pad(cen)
            else:  # no aligned overlap this frame: empty third curve
                oc, mcm = self._pad(np.zeros((0, 2), np.float32))
                k0 = 0
            self._state = self._update(
                self._state,
                ol,
                ml,
                orr,
                mr,
                jnp.asarray(sl, jnp.int32),
                jnp.asarray(sr, jnp.int32),
                obs_centre=oc,
                obs_centre_mask=mcm,
                centre_start=jnp.asarray(k0, jnp.int32),
            )
        else:
            self._state = self._update(
                self._state,
                ol,
                ml,
                orr,
                mr,
                jnp.asarray(sl, jnp.int32),
                jnp.asarray(sr, jnp.int32),
            )

    # -- helpers ---------------------------------------------------------
    def _prepare(self, obs: np.ndarray):
        """Normalise a BEV boundary polyline for point-for-point scoring:
        orient near-to-far, resample along its arclength at exactly the
        map's point spacing, pad to the static size, and measure the
        visible-start offset.

        The reference stride-downsamples to map density and pairs the
        observation with a map slice starting at the particle's nearest
        boundary point (localiser.py:241-253, 391-400). That pairing is
        only geometrically consistent when the observation starts AT the
        car and is already near map density; a camera whose near field
        starts y0 metres ahead biases every index-matched pair by y0 —
        measured as a constant ~6.5 m error floor that dragged the whole
        particle cloud backwards ~0.4 m per update. Interpolating at the
        exact map spacing and returning round(y0/spacing) for the update
        step to add to the slice start makes the same point-for-point
        error the reference computes start from the first VISIBLE map
        point instead."""
        obs, start = self._normalise(obs)
        padded, mask = self._pad(obs)
        return padded, mask, jnp.asarray(start, jnp.int32)

    def _normalise(self, obs: np.ndarray) -> tuple[np.ndarray, int]:
        """Orientation + arclength resampling + visible-start measurement
        (the numpy half of ``_prepare``; see its docstring)."""
        obs = np.asarray(obs, np.float32)[:, :2]
        p = self._pf_config.max_observation_points
        if len(obs) > 1:
            # orient near-to-far by comparing the mean forward coordinate
            # of the first and last few points — a single-endpoint
            # comparison mis-flips a hairpin whose far end curves back
            # below the near end's y
            k = max(1, min(5, len(obs) // 4))
            if obs[:k, 1].mean() > obs[-k:, 1].mean():  # far-to-near: flip
                obs = obs[::-1]
            seg = np.linalg.norm(obs[1:] - obs[:-1], axis=1)
            # resample only on a REAL density mismatch (sparse per-row
            # chain points, decimated streams): when the observation is
            # already near map density, its native points correspond to
            # local map points better than a global-average regrid does
            # (boundary spacing varies with curvature side)
            ratio = seg.mean() / self._avg_spacing
            if ratio > 1.5 or ratio < 0.67:
                s = np.concatenate([[0.0], np.cumsum(seg)])
                n = int(s[-1] / self._avg_spacing) + 1
                n = max(2, min(n, p))
                si = np.arange(n, dtype=np.float32) * self._avg_spacing
                obs = np.stack(
                    [np.interp(si, s, obs[:, 0]), np.interp(si, s, obs[:, 1])],
                    axis=1,
                ).astype(np.float32)
        obs = obs[:p]
        # along-track offset of the first visible point from the car:
        # its forward (y) BEV coordinate, in map-index units
        start = (
            int(round(max(float(obs[0, 1]), 0.0) / self._avg_spacing))
            if len(obs)
            else 0
        )
        return obs, start

    def _pad(self, obs: np.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        p = self._pf_config.max_observation_points
        obs = np.asarray(obs, np.float32)[:p]
        padded = np.zeros((p, 2), np.float32)
        mask = np.zeros((p,), bool)
        padded[: len(obs)] = obs
        mask[: len(obs)] = True
        return jnp.asarray(padded), jnp.asarray(mask)

    # exposed for benchmarking / diagnostics
    @property
    def particle_states(self) -> np.ndarray:
        s = np.asarray(self._state.states)
        return s[np.asarray(self._state.valid)]

    @property
    def particle_scores(self) -> np.ndarray:
        s = np.asarray(self._state.scores)
        return s[np.asarray(self._state.valid)]
