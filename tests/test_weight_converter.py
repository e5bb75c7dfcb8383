"""torch -> flax weight-converter validation (VERDICT r1 item 5).

segmentation_models_pytorch is not installed here, so the test builds a
faithful torch replica of smp's FPN-ResNet18 with smp's EXACT state_dict
key layout (encoder = torchvision resnet18 naming; decoder.p5 conv /
FPNBlock.skip_conv; decoder.seg_blocks.{i}.block.{j}.block.{0,1};
segmentation_head.0) — mirroring
/root/reference/src/acmpc/perception/segmentation.py:52-54's
smp.FPN(encoder_name="resnet18", classes=10) — randomises every weight
and running stat, converts with convert_torch_state_dict, and checks the
flax model reproduces the torch forward pass numerically end-to-end.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from acmpc_tpu.models.fpn_resnet18 import (  # noqa: E402
    FPNResNet18,
    convert_torch_state_dict,
)


class TorchBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout),
            )

    def forward(self, x):
        identity = x
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        if self.downsample is not None:
            identity = self.downsample(x)
        return F.relu(y + identity)


class TorchEncoder(tnn.Module):
    """torchvision resnet18 key naming (what smp's resnet18 encoder uses)."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = tnn.Sequential(
            TorchBasicBlock(64, 64), TorchBasicBlock(64, 64)
        )
        self.layer2 = tnn.Sequential(
            TorchBasicBlock(64, 128, 2), TorchBasicBlock(128, 128)
        )
        self.layer3 = tnn.Sequential(
            TorchBasicBlock(128, 256, 2), TorchBasicBlock(256, 256)
        )
        self.layer4 = tnn.Sequential(
            TorchBasicBlock(256, 512, 2), TorchBasicBlock(512, 512)
        )

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        c2 = self.layer1(x)
        c3 = self.layer2(c2)
        c4 = self.layer3(c3)
        c5 = self.layer4(c4)
        return c2, c3, c4, c5


class TorchConv3x3GNReLU(tnn.Module):
    def __init__(self, cin, cout, upsample=False):
        super().__init__()
        self.upsample = upsample
        self.block = tnn.Sequential(
            tnn.Conv2d(cin, cout, 3, 1, 1, bias=False),
            tnn.GroupNorm(32, cout),
            tnn.ReLU(inplace=True),
        )

    def forward(self, x):
        x = self.block(x)
        if self.upsample:
            x = F.interpolate(x, scale_factor=2, mode="nearest")
        return x


class TorchSegBlock(tnn.Module):
    def __init__(self, cin, cout, n_upsamples=0):
        super().__init__()
        blocks = [TorchConv3x3GNReLU(cin, cout, upsample=bool(n_upsamples))]
        if n_upsamples > 1:
            blocks += [
                TorchConv3x3GNReLU(cout, cout, upsample=True)
                for _ in range(1, n_upsamples)
            ]
        self.block = tnn.Sequential(*blocks)

    def forward(self, x):
        return self.block(x)


class TorchFPNBlock(tnn.Module):
    def __init__(self, pyramid, skip):
        super().__init__()
        self.skip_conv = tnn.Conv2d(skip, pyramid, 1)

    def forward(self, x, skip):
        return F.interpolate(x, scale_factor=2, mode="nearest") + self.skip_conv(
            skip
        )


class TorchFPNDecoder(tnn.Module):
    def __init__(self):
        super().__init__()
        self.p5 = tnn.Conv2d(512, 256, 1)
        self.p4 = TorchFPNBlock(256, 256)
        self.p3 = TorchFPNBlock(256, 128)
        self.p2 = TorchFPNBlock(256, 64)
        self.seg_blocks = tnn.ModuleList(
            [TorchSegBlock(256, 128, n) for n in (3, 2, 1, 0)]
        )

    def forward(self, c2, c3, c4, c5):
        p5 = self.p5(c5)
        p4 = self.p4(p5, c4)
        p3 = self.p3(p4, c3)
        p2 = self.p2(p3, c2)
        return sum(
            blk(p) for blk, p in zip(self.seg_blocks, (p5, p4, p3, p2))
        )


class TorchSmpFPN(tnn.Module):
    """smp.FPN(encoder_name="resnet18", classes=10) state-dict layout."""

    def __init__(self, classes=10):
        super().__init__()
        self.encoder = TorchEncoder()
        self.decoder = TorchFPNDecoder()
        self.segmentation_head = tnn.Sequential(
            tnn.Conv2d(128, classes, 1),
            tnn.UpsamplingBilinear2d(scale_factor=4),
        )

    def forward(self, x):
        c2, c3, c4, c5 = self.encoder(x)
        return self.segmentation_head(self.decoder(c2, c3, c4, c5))


def _randomise(model: tnn.Module, seed: int = 0):
    """Non-trivial weights AND running stats so every mapped tensor
    affects the output."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.1)
        for name, b in model.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(torch.randn(b.shape, generator=g) * 0.05)
            elif name.endswith("running_var"):
                b.copy_(0.5 + torch.rand(b.shape, generator=g))


@pytest.fixture(scope="module")
def converted():
    tm = TorchSmpFPN().eval()
    _randomise(tm)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables = convert_torch_state_dict(sd)
    return tm, sd, variables


def test_converter_consumes_every_torch_tensor(converted):
    _, sd, variables = converted
    import jax

    n_flax = len(jax.tree_util.tree_leaves(variables))
    n_torch = len(
        [k for k in sd if not k.endswith("num_batches_tracked")]
    )
    assert n_flax == n_torch, f"flax {n_flax} tensors vs torch {n_torch}"
    # total parameter count must match exactly
    flax_count = sum(
        int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(variables)
    )
    torch_count = sum(
        int(np.prod(v.shape))
        for k, v in sd.items()
        if not k.endswith("num_batches_tracked")
    )
    assert flax_count == torch_count


def test_forward_equivalence_torch_vs_flax(converted):
    tm, _, variables = converted
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 3, 64, 96)).astype(np.float32)

    with torch.no_grad():
        out_t = tm(torch.from_numpy(x)).numpy()  # NCHW

    model = FPNResNet18(num_classes=10)
    out_f = model.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    out_f = np.transpose(np.asarray(out_f), (0, 3, 1, 2))

    assert out_f.shape == out_t.shape
    np.testing.assert_allclose(out_f, out_t, rtol=1e-4, atol=1e-4)
