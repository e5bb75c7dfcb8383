"""Train and ship a segmentation checkpoint on synthetic sim frames.

The reference downloads 7 trained FPN-ResNet18 checkpoints as assets
(scripts/download_assets.sh, data/models/segmentation/). Zero egress
here, so the shipped model is TRAINED by this tool instead: the
synthetic simulator renders textured camera frames (asphalt speckle /
grass mottling / sky — sim.py render_camera_image) with ground-truth
drivable masks, and the framework's own Flax FPN learns the 2-class task
(class 1 = drivable, matching the reference's class convention where
classes > 1 are zeroed, segmentation.py:88-92). Training is a single
jitted optax step on the TPU; the checkpoint saves through
TrackSegmenter.save_variables (flax msgpack) and loads through the same
loader the agent uses.

Run:  python tools/train_segmenter.py [--steps 300] [--out data/models/segmentation/synthetic_fpn.msgpack]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

TRAIN_H, TRAIN_W = 192, 320  # FPN is fully convolutional; inference can
# run at the configs' full camera resolution with the same weights


def make_sim(seed: int = 0):
    import jax.numpy as jnp

    from acmpc_tpu.localise.track_map import TrackMap
    from acmpc_tpu.perception.camera import CameraInfo
    from acmpc_tpu.runtime.sim import SyntheticSimulator

    rng = np.random.default_rng(seed)
    theta = np.linspace(0, 2 * np.pi, 1200, endpoint=False)
    r = 180.0 + 30.0 * np.sin(3 * theta) + 12.0 * np.sin(7 * theta)
    centre = np.stack([r * np.cos(theta), r * np.sin(theta)], axis=1)
    d = np.roll(centre, -1, axis=0) - centre
    t = d / np.linalg.norm(d, axis=1, keepdims=True)
    n = np.stack([-t[:, 1], t[:, 0]], axis=1)
    tm = TrackMap(
        centre=jnp.asarray(centre, jnp.float32),
        left=jnp.asarray(centre + 5.0 * n, jnp.float32),
        right=jnp.asarray(centre - 5.0 * n, jnp.float32),
    )
    cam = CameraInfo(
        width=TRAIN_W,
        height=TRAIN_H,
        vertical_fov_deg=60.0,
        position=[0.0, 0.0, 1.2],
        pitch_deg=9.0,
    )
    return SyntheticSimulator(tm, cam, half_width=5.0), rng


def sample_frames(sim, rng, n: int):
    """Random poses around the lap: index + lateral offset + yaw jitter."""
    images = np.empty((n, TRAIN_H, TRAIN_W, 3), np.uint8)
    masks = np.empty((n, TRAIN_H, TRAIN_W), np.uint8)
    m = len(np.asarray(sim._centre))
    for i in range(n):
        idx = int(rng.integers(0, m))
        p0 = sim._centre[idx]
        p1 = sim._centre[(idx + 1) % m]
        yaw = float(np.arctan2(p1[1] - p0[1], p1[0] - p0[0]))
        normal = np.array([-np.sin(yaw), np.cos(yaw)])
        off = float(rng.uniform(-3.0, 3.0))
        sim.x, sim.y = float(p0[0] + off * normal[0]), float(p0[1] + off * normal[1])
        sim.yaw = yaw + float(rng.uniform(-0.2, 0.2))
        sim.t = float(rng.uniform(0, 1e4))  # decorrelate texture noise
        mask = sim.render_drivable_mask()
        images[i] = sim.render_camera_image(mask)
        masks[i] = mask
    return images, masks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument(
        "--out",
        default=str(
            ROOT / "data" / "models" / "segmentation" / "synthetic_fpn.msgpack"
        ),
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from acmpc_tpu.models.fpn_resnet18 import FPNResNet18

    model = FPNResNet18(num_classes=10, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    variables = model.init(key, jnp.zeros((1, TRAIN_H, TRAIN_W, 3)))

    tx = optax.adamw(args.lr)
    opt_state = tx.init(variables)

    @jax.jit
    def train_step(variables, opt_state, images, labels):
        def loss_fn(v):
            x = images.astype(jnp.float32) / 255.0
            logits = model.apply(v, x)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels.astype(jnp.int32)
            )
            return ce.mean()

        loss, grads = jax.value_and_grad(loss_fn)(variables)
        updates, opt_state = tx.update(grads, opt_state, variables)
        return optax.apply_updates(variables, updates), opt_state, loss

    @jax.jit
    def eval_iou(variables, images, labels):
        x = images.astype(jnp.float32) / 255.0
        pred = jnp.argmax(model.apply(variables, x), axis=-1) == 1
        gt = labels == 1
        inter = jnp.sum(pred & gt)
        union = jnp.sum(pred | gt)
        return inter / jnp.maximum(union, 1)

    sim, rng = make_sim()
    val_images, val_masks = sample_frames(sim, rng, 32)
    val_images = jnp.asarray(val_images)
    val_masks = jnp.asarray(val_masks)

    t0 = time.perf_counter()
    for step in range(args.steps):
        images, masks = sample_frames(sim, rng, args.batch)
        variables, opt_state, loss = train_step(
            variables, opt_state, jnp.asarray(images), jnp.asarray(masks)
        )
        if step % 50 == 0 or step == args.steps - 1:
            iou = float(eval_iou(variables, val_images, val_masks))
            print(
                f"step {step}: loss {float(loss):.4f} val IoU {iou:.4f} "
                f"({time.perf_counter() - t0:.0f}s)"
            )

    iou = float(eval_iou(variables, val_images, val_masks))
    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    from flax import serialization

    # fp16 storage halves the asset; the loader casts to the configured
    # compute dtype (segmentation.py load_variables)
    half = jax.tree.map(
        lambda a: a.astype(jnp.float16) if a.dtype == jnp.float32 else a,
        variables,
    )
    out.write_bytes(serialization.to_bytes(half))
    print(f"final val IoU {iou:.4f}; wrote {out}")
    assert iou > 0.9, "trained model did not reach IoU 0.9"


if __name__ == "__main__":
    main()
