"""Vehicle geometry and steering data.

TPU-native replacement for the external ``ace.SteeringGeometry`` dependency
(reference usage: /root/reference/src/acmpc/control/dynamics.py:11-13,
localisation/localiser.py:148-151). The reference reads wheelbase/width/
steering limits from per-car data directories fetched by a download script
(which ships no data in-repo); here the same quantities are typed config
with sane defaults for the reference's flagship car, overridable per track
config.

A steering *map* (normalised input -> road-wheel angle) is modelled as a
polynomial; the reference's ``steering_angle``/``normalised input`` pair is
covered by :meth:`VehicleParams.steering_angle` and its inverse.
"""

from __future__ import annotations

import dataclasses
import math


@dataclasses.dataclass(frozen=True)
class VehicleParams:
    """Static vehicle geometry used by the dynamics and localisation."""

    name: str = "audi_r8_lms_2016"
    wheelbase: float = 2.650  # m
    width: float = 1.940  # m
    max_steering_deg: float = 360.0  # steering-wheel lock-to-lock half angle
    steering_ratio: float = 13.0  # wheel angle -> road-wheel angle

    @property
    def max_steering_angle(self) -> float:
        """Maximum road-wheel angle in radians (ace.max_steering_angle())."""
        return math.radians(self.max_steering_deg) / self.steering_ratio

    @property
    def margin(self) -> float:
        """Half width — lateral safety margin used by the track-limit
        constraints (reference dynamics.py:15)."""
        return self.width / 2.0

    def steering_angle(self, normalised_input: float) -> float:
        """Road-wheel angle (rad) for a normalised [-1, 1] steering input."""
        return normalised_input * self.max_steering_angle

    def normalised_input(self, steering_angle: float) -> float:
        """Inverse of :meth:`steering_angle`."""
        return steering_angle / self.max_steering_angle

    @classmethod
    def from_config(cls, cfg: dict | None) -> "VehicleParams":
        if not cfg:
            return cls()
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in cfg.items() if k in known})
