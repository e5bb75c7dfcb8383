"""FPN-ResNet18 semantic segmentation model in Flax.

TPU-native counterpart of the reference's
``smp.FPN(encoder_name="resnet18", classes=10)``
(/root/reference/src/acmpc/perception/segmentation.py:52-53): a ResNet-18
encoder, a 256-channel FPN top-down decoder, 128-channel segmentation
blocks merged by summation, and a 1x1 classifier upsampled 4x to full
resolution. Layout is NHWC (TPU-preferred); inference runs in bf16 with
fp32 classifier logits.

Weight conversion from the reference's torch checkpoints is handled by
``convert_torch_state_dict`` — a name-mapped transpose of the smp layout
(torch OIHW -> flax HWIO).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(
            self.features, (3, 3), (self.strides, self.strides),
            padding=1, use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        y = nn.BatchNorm(
            use_running_average=True, dtype=self.dtype, name="bn1"
        )(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), padding=1, use_bias=False,
            dtype=self.dtype, name="conv2",
        )(y)
        y = nn.BatchNorm(
            use_running_average=True, dtype=self.dtype, name="bn2"
        )(y)
        if residual.shape[-1] != self.features or self.strides != 1:
            residual = nn.Conv(
                self.features, (1, 1), (self.strides, self.strides),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(residual)
            residual = nn.BatchNorm(
                use_running_average=True, dtype=self.dtype, name="downsample_bn"
            )(residual)
        return nn.relu(y + residual)


class ResNet18Encoder(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            64, (7, 7), (2, 2), padding=3, use_bias=False,
            dtype=self.dtype, name="conv1",
        )(x)
        x = nn.BatchNorm(use_running_average=True, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats = []
        for i, (features, strides) in enumerate(
            [(64, 1), (128, 2), (256, 2), (512, 2)]
        ):
            x = BasicBlock(
                features, strides, dtype=self.dtype, name=f"layer{i + 1}_0"
            )(x)
            x = BasicBlock(features, 1, dtype=self.dtype, name=f"layer{i + 1}_1")(x)
            feats.append(x)
        return feats  # c2 (1/4, 64) .. c5 (1/32, 512)


def _upsample(x, factor: int):
    n, h, w, c = x.shape
    return jax.image.resize(
        x, (n, h * factor, w * factor, c), method="nearest"
    )


def _upsample_bilinear_align_corners(x, factor: int):
    """Bilinear upsample with align_corners=True semantics — matches the
    torch ``nn.UpsamplingBilinear2d`` smp uses in its segmentation head
    (jax.image.resize only offers half-pixel-centre bilinear)."""

    def axis_resize(v, size_in: int, size_out: int, axis: int):
        pos = jnp.arange(size_out) * ((size_in - 1) / (size_out - 1))
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, size_in - 1)
        w_hi = (pos - lo).astype(v.dtype)
        shape = [1] * v.ndim
        shape[axis] = size_out
        w_hi = w_hi.reshape(shape)
        vl = jnp.take(v, lo, axis=axis)
        vh = jnp.take(v, hi, axis=axis)
        return vl * (1.0 - w_hi) + vh * w_hi

    _, h, w, _ = x.shape
    x = axis_resize(x, h, h * factor, 1)
    return axis_resize(x, w, w * factor, 2)


class Conv3x3GNReLU(nn.Module):
    features: int
    upsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features, (3, 3), padding=1, use_bias=False,
            dtype=self.dtype, name="conv",
        )(x)
        # epsilon matches torch GroupNorm (1e-5; flax defaults to 1e-6)
        x = nn.GroupNorm(
            num_groups=32, epsilon=1e-5, dtype=self.dtype, name="gn"
        )(x)
        x = nn.relu(x)
        if self.upsample:
            x = _upsample(x, 2)
        return x


class SegmentationBlock(nn.Module):
    features: int
    n_upsamples: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        n_blocks = max(1, self.n_upsamples)
        for i in range(n_blocks):
            x = Conv3x3GNReLU(
                self.features,
                upsample=bool(self.n_upsamples > 0),
                dtype=self.dtype,
                name=f"block{i}",
            )(x)
        return x


class FPNResNet18(nn.Module):
    """FPN segmentation head over a ResNet-18 encoder (smp-compatible
    topology: pyramid 256, segmentation 128, sum merge, 4x upsampling)."""

    num_classes: int = 10
    pyramid_channels: int = 256
    segmentation_channels: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[-3], x.shape[-2]
        if h % 32 or w % 32:
            raise ValueError(
                f"FPN input dims must be divisible by 32, got {h}x{w} "
                "(same constraint as the reference smp.FPN)"
            )
        c2, c3, c4, c5 = ResNet18Encoder(dtype=self.dtype, name="encoder")(x)

        p5 = nn.Conv(
            self.pyramid_channels, (1, 1), dtype=self.dtype, name="p5"
        )(c5)
        p4 = nn.Conv(
            self.pyramid_channels, (1, 1), dtype=self.dtype, name="p4"
        )(c4) + _upsample(p5, 2)
        p3 = nn.Conv(
            self.pyramid_channels, (1, 1), dtype=self.dtype, name="p3"
        )(c3) + _upsample(p4, 2)
        p2 = nn.Conv(
            self.pyramid_channels, (1, 1), dtype=self.dtype, name="p2"
        )(c2) + _upsample(p3, 2)

        s5 = SegmentationBlock(
            self.segmentation_channels, 3, dtype=self.dtype, name="s5"
        )(p5)
        s4 = SegmentationBlock(
            self.segmentation_channels, 2, dtype=self.dtype, name="s4"
        )(p4)
        s3 = SegmentationBlock(
            self.segmentation_channels, 1, dtype=self.dtype, name="s3"
        )(p3)
        s2 = SegmentationBlock(
            self.segmentation_channels, 0, dtype=self.dtype, name="s2"
        )(p2)

        x = s5 + s4 + s3 + s2
        x = nn.Dropout(0.2, deterministic=not train)(x)
        x = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32, name="head")(x)
        # smp's SegmentationHead upsamples with UpsamplingBilinear2d
        # (align_corners=True), not nearest
        return _upsample_bilinear_align_corners(x, 4)


def convert_torch_state_dict(state_dict: dict) -> dict:
    """Map an smp FPN-ResNet18 torch state_dict onto this model's params.

    torch conv weights are OIHW -> flax HWIO; BatchNorm gamma/beta map to
    scale/bias with running stats into batch_stats. Returns
    {"params": ..., "batch_stats": ...} variables.
    """
    import numpy as np

    params: dict = {}
    stats: dict = {}

    def put(tree, path, value):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = jnp.asarray(value)

    def conv(w):
        return np.transpose(np.asarray(w), (2, 3, 1, 0))

    def bn(dst_tree, flax_path, torch_prefix):
        put(params, flax_path + ("scale",), state_dict[torch_prefix + ".weight"])
        put(params, flax_path + ("bias",), state_dict[torch_prefix + ".bias"])
        put(stats, flax_path + ("mean",), state_dict[torch_prefix + ".running_mean"])
        put(stats, flax_path + ("var",), state_dict[torch_prefix + ".running_var"])

    enc = ("encoder",)
    put(params, enc + ("conv1", "kernel"), conv(state_dict["encoder.conv1.weight"]))
    bn(params, enc + ("bn1",), "encoder.bn1")
    for layer in range(1, 5):
        for block in range(2):
            fl = enc + (f"layer{layer}_{block}",)
            tp = f"encoder.layer{layer}.{block}"
            put(params, fl + ("conv1", "kernel"), conv(state_dict[f"{tp}.conv1.weight"]))
            bn(params, fl + ("bn1",), f"{tp}.bn1")
            put(params, fl + ("conv2", "kernel"), conv(state_dict[f"{tp}.conv2.weight"]))
            bn(params, fl + ("bn2",), f"{tp}.bn2")
            if f"{tp}.downsample.0.weight" in state_dict:
                put(
                    params,
                    fl + ("downsample_conv", "kernel"),
                    conv(state_dict[f"{tp}.downsample.0.weight"]),
                )
                bn(params, fl + ("downsample_bn",), f"{tp}.downsample.1")

    # decoder lateral convs (smp names: decoder.p5/p4/p3/p2)
    for p in ("p5", "p4", "p3", "p2"):
        key = f"decoder.{p}.weight"
        if key not in state_dict:  # p4..p2 are Conv in a Sequential in smp
            key = f"decoder.{p}.skip_conv.weight"
        put(params, (p, "kernel"), conv(state_dict[key]))
        bkey = key.replace("weight", "bias")
        put(params, (p, "bias"), state_dict[bkey])

    # segmentation blocks: smp decoder.seg_blocks.{i}.block — i: p5,p4,p3,p2
    seg_names = ["s5", "s4", "s3", "s2"]
    for i, name in enumerate(seg_names):
        j = 0
        while True:
            base = f"decoder.seg_blocks.{i}.block"
            ck = f"{base}.{j}.block.0.weight"
            if ck not in state_dict:
                if j == 0:
                    ck0 = f"{base}.block.0.weight"
                    if ck0 in state_dict:
                        put(params, (name, "block0", "conv", "kernel"), conv(state_dict[ck0]))
                        put(params, (name, "block0", "gn", "scale"), state_dict[f"{base}.block.1.weight"])
                        put(params, (name, "block0", "gn", "bias"), state_dict[f"{base}.block.1.bias"])
                break
            put(params, (name, f"block{j}", "conv", "kernel"), conv(state_dict[ck]))
            put(params, (name, f"block{j}", "gn", "scale"), state_dict[f"{base}.{j}.block.1.weight"])
            put(params, (name, f"block{j}", "gn", "bias"), state_dict[f"{base}.{j}.block.1.bias"])
            j += 1

    put(params, ("head", "kernel"), conv(state_dict["segmentation_head.0.weight"]))
    put(params, ("head", "bias"), state_dict["segmentation_head.0.bias"])
    return {"params": params, "batch_stats": stats}
