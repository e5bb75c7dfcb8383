"""Perception facade: camera frame -> drivable mask -> BEV track polylines.

Synchronous core of the reference Perceiver
(/root/reference/src/acmpc/perception/perception.py:24-290). The reference
splits segmentation and track extraction into two free-running processes
over shared images; here both stages are device programs chained inside
one jit (the mask never leaves the TPU between them), and the runtime
shell (runtime/agent.py) decides the threading.

Host-side responsibilities kept from the reference: the JPEG
encode/decode round trip that matches the training distribution
(perception.py:69-81, via OpenCV rather than TurboJPEG) and the resize
guard (perception.py:83-99).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from acmpc_tpu.config.schema import PerceptionConfig
from acmpc_tpu.perception.camera import CameraInfo
from acmpc_tpu.perception.segmentation import TrackSegmenter
from acmpc_tpu.perception.tracks import (
    TrackExtractionConfig,
    TrackLimitExtractor,
)


class Perceiver:
    def __init__(self, cfg: PerceptionConfig, variables: dict | None = None):
        self.cfg = cfg
        self.camera = CameraInfo.from_config(cfg)
        self.segmenter = TrackSegmenter(cfg, variables)
        self.extractor = TrackLimitExtractor(
            TrackExtractionConfig.from_config(cfg), self.camera
        )
        self._pipeline = jax.jit(self._run_pipeline)
        self._warned_resize = False

    def _run_pipeline(self, variables, image):
        drivable, semantics = self.segmenter._apply(variables, image)
        tracks = self.extractor.extract(drivable)
        return drivable, semantics, tracks

    # -- host preprocessing ---------------------------------------------
    def _encode_decode_image(self, image: np.ndarray) -> np.ndarray:
        """JPEG round trip so inference sees the training distribution
        (reference perception.py:69-81)."""
        import cv2

        ok, buf = cv2.imencode(".jpg", image)
        if not ok:
            return image
        return cv2.imdecode(buf, cv2.IMREAD_COLOR)

    def _ensure_size(self, image: np.ndarray) -> np.ndarray:
        if image.shape[:2] != (self.cfg.image_height, self.cfg.image_width):
            import cv2

            if not self._warned_resize:
                self._warned_resize = True
            image = cv2.resize(
                image,
                dsize=(self.cfg.image_width, self.cfg.image_height),
                interpolation=cv2.INTER_LINEAR,
            )
        return image

    # -- public API ------------------------------------------------------
    def perceive(self, image: np.ndarray) -> dict:
        """Full pipeline on one frame. Returns a dict with the drivable
        mask, semantic visualisation and BEV track polylines."""
        image = self._ensure_size(self._encode_decode_image(image))
        drivable, semantics, tracks = self._pipeline(
            self.segmenter.variables, jnp.asarray(image)
        )
        return {
            "drivable": drivable,
            "semantics": semantics,
            "centreline": tracks["centre"],
            "left": tracks["left"],
            "right": tracks["right"],
            "left_raw": tracks["left_raw"],
            "left_raw_mask": tracks["left_raw_mask"],
            "right_raw": tracks["right_raw"],
            "right_raw_mask": tracks["right_raw_mask"],
        }
