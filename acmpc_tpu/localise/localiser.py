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
        reference's _score_particles path (localiser.py:227, 234-239)."""
        ol, ml = self._prepare(left)
        orr, mr = self._prepare(right)
        self._state = self._update(self._state, ol, ml, orr, mr)

    # -- helpers ---------------------------------------------------------
    def _prepare(self, obs: np.ndarray):
        """Downsample to map point density then pad to the static size
        (reference localiser.py:241-253)."""
        obs = np.asarray(obs, np.float32)[:, :2]
        p = self._pf_config.max_observation_points
        if len(obs) > 1:
            seg = np.linalg.norm(obs[1:] - obs[:-1], axis=1).mean()
            n_points = int(len(obs) * seg / self._avg_spacing)
            n_points = max(1, min(n_points, len(obs)))
            idx = np.linspace(0, len(obs) - 1, n_points).astype(np.int64)
            obs = obs[np.unique(idx)]
        obs = obs[:p]
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
