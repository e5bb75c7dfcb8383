"""Segmentation inference runner.

Counterpart of the reference TrackSegmenter / TrackSegmenterTensorRT pair
(/root/reference/src/acmpc/perception/segmentation.py:23-117): load
weights, normalise the frame, run the network, argmax to a drivable mask
(class > 1 zeroed) plus the semantic visualisation.

The backend seam the reference gets from torch-vs-TensorRT is here
jit-vs-AOT: ``TrackSegmenter`` jit-compiles the Flax FPN at the configured
precision; ``TrackSegmenterAOT`` ahead-of-time lowers/compiles for a fixed
input shape (the XLA analogue of a serialized TensorRT engine) so the
first real-time frame pays no compile.
"""

from __future__ import annotations

import pathlib

import jax
import jax.numpy as jnp
import numpy as np

from acmpc_tpu.config.schema import PerceptionConfig
from acmpc_tpu.models.fpn_resnet18 import FPNResNet18

PRECISION = {
    "full": jnp.float32,
    "fp32": jnp.float32,
    "fp16": jnp.float16,
    "bf16": jnp.bfloat16,
}


class TrackSegmenter:
    def __init__(self, cfg: PerceptionConfig, variables: dict | None = None):
        self._width = cfg.image_width
        self._height = cfg.image_height
        self._dtype = PRECISION[cfg.precision]
        self.model = FPNResNet18(num_classes=10, dtype=self._dtype)
        if variables is None:
            variables = self.load_variables(cfg.model_path)
        self.variables = variables
        self._forward = jax.jit(self._apply)

    # -- weights ---------------------------------------------------------
    def load_variables(self, path: str) -> dict:
        """Load weights: .msgpack (flax serialization, native), .npz, or a
        torch checkpoint (converted via models.fpn_resnet18)."""
        p = pathlib.Path(path)
        if not p.exists():
            # no shipped assets (the reference downloads them at install
            # time); initialise randomly so the pipeline stays runnable —
            # but LOUDLY: a silently random model segments garbage, and a
            # stale config path cost half a round-5 day to diagnose
            import warnings

            warnings.warn(
                f"segmentation checkpoint {p} does not exist: "
                "initialising RANDOM weights (every mask will be "
                "garbage). Fix perception.model_path.",
                stacklevel=2,
            )
            key = jax.random.PRNGKey(0)
            dummy = jnp.zeros((1, 64, 64, 3), self._dtype)
            return self.model.init(key, dummy)
        if p.suffix == ".msgpack":
            from flax import serialization

            key = jax.random.PRNGKey(0)
            dummy = jnp.zeros((1, 64, 64, 3), self._dtype)
            template = self.model.init(key, dummy)
            loaded = serialization.from_bytes(template, p.read_bytes())
            # shipped checkpoints store fp16 (half the asset size); cast
            # floating leaves to the configured compute dtype
            return jax.tree.map(
                lambda a: a.astype(self._dtype)
                if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
                else a,
                loaded,
            )
        if p.suffix in (".pt", ".pth"):
            import torch

            from acmpc_tpu.models.fpn_resnet18 import convert_torch_state_dict

            sd = torch.load(p, map_location="cpu", weights_only=True)
            return convert_torch_state_dict(
                {k: v.numpy() for k, v in sd.items()}
            )
        raise ValueError(f"unknown weight format: {p.suffix}")

    def save_variables(self, path: str):
        from flax import serialization

        pathlib.Path(path).write_bytes(serialization.to_bytes(self.variables))

    # -- inference -------------------------------------------------------
    def _apply(self, variables, image):
        """image: (H, W, 3) uint8 -> (drivable (H, W) uint8, semantics)."""
        x = image.astype(self._dtype) / 255.0
        logits = self.model.apply(variables, x[None])
        semantics = jnp.argmax(logits, axis=-1)[0].astype(jnp.uint8)
        drivable = jnp.where(semantics > 1, 0, semantics).astype(jnp.uint8)
        return drivable, semantics

    def segment_drivable_area(self, image: np.ndarray):
        """(drivable_mask, semantic_vis) — reference segmentation.py:75-90."""
        drivable, semantics = self._forward(self.variables, jnp.asarray(image))
        return drivable, semantics


class TrackSegmenterAOT(TrackSegmenter):
    """Ahead-of-time compiled variant (the TensorRT-engine analogue): the
    XLA executable is built at construction for the configured frame shape."""

    def __init__(self, cfg: PerceptionConfig, variables: dict | None = None):
        super().__init__(cfg, variables)
        dummy = jnp.zeros((self._height, self._width, 3), jnp.uint8)
        self._compiled = (
            jax.jit(self._apply).lower(self.variables, dummy).compile()
        )

    def segment_drivable_area(self, image: np.ndarray):
        return self._compiled(self.variables, jnp.asarray(image))
