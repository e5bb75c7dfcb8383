"""Track map container and IO.

The reference stores maps as pickled ``.npy`` dicts with outside/inside
boundary keys renamed to left/right on load plus near-duplicate removal
(/root/reference/src/acmpc/utils/load.py:9-35, mapping/map_maker.py:169-177).
This framework's native format is a plain ``.npz`` with ``centre``, ``left``,
``right`` arrays; the reference's pickled ``.npy`` dict is also readable for
asset compatibility.

On device the map is a pytree of fixed-shape arrays. Nearest-neighbour
queries are brute-force distance argmins — on TPU a (K, M) distance matrix
is matmul-shaped work, which beats pointer-chasing KD-trees (the reference
uses SciPy cKDTree, utils/kdtree.py:1-14) for the 10^3-10^4-point maps this
system uses.
"""

from __future__ import annotations

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


def _remove_near_duplicates(points: np.ndarray, threshold: float = 1e-4) -> np.ndarray:
    """Drop consecutive near-duplicate points (reference load.py:28-35)."""
    if len(points) < 2:
        return points
    keep = np.ones(len(points), dtype=bool)
    diffs = np.linalg.norm(np.diff(points, axis=0), axis=1)
    keep[1:] = diffs > threshold
    return points[keep]


@struct.dataclass
class TrackMap:
    """Fixed-shape track map: three boundary polylines + cached squared
    norms for brute-force NN."""

    centre: jnp.ndarray  # (Mc, 2)
    left: jnp.ndarray  # (Ml, 2)
    right: jnp.ndarray  # (Mr, 2)

    @property
    def n_centre(self) -> int:
        return self.centre.shape[0]

    @property
    def average_spacing(self) -> jnp.ndarray:
        d = jnp.linalg.norm(self.centre[1:] - self.centre[:-1], axis=1)
        return jnp.mean(d)


def nearest_point(points: jnp.ndarray, polyline: jnp.ndarray, refine: int = 32):
    """Brute-force nearest neighbour: points (..., K, 2) against polyline
    (M, 2). Returns (distances (..., K), indices (..., K)).

    Two stages, both TPU-shaped. Coarse: d^2 = |p|^2 - 2 p.m + |m|^2 —
    the cross term is a (K, M) matmul on the MXU, forced to
    precision=HIGHEST because at km-scale world coordinates the terms
    reach ~1e6 and the cancellation leaves only metres of signal (default
    bf16 TPU matmuls put ~5e3 of noise into the cross term, i.e. tens of
    metres of index error; even exact-fp32 GEMMs mis-rank near-ties).
    Refine: exact squared differences over a ±``refine`` index window
    around the coarse argmin — a (K, 2R+1, 2) gather whose fp32 result is
    cancellation-free, so the final index is the true nearest neighbour
    whenever the coarse pick lands within ``refine`` points of it (fp32
    coarse error is ~1 in d^2, i.e. a few points at 0.5 m spacing)."""
    m = polyline.shape[0]
    p2 = jnp.sum(points**2, axis=-1, keepdims=True)  # (K, 1)
    m2 = jnp.sum(polyline**2, axis=-1)  # (M,)
    cross = jnp.matmul(points, polyline.T, precision=jax.lax.Precision.HIGHEST)
    d2 = p2 - 2.0 * cross + m2[None, :]
    coarse = jnp.argmin(d2, axis=-1)  # (K,)
    offs = jnp.arange(-refine, refine + 1)  # (2R+1,)
    cand_idx = jnp.mod(coarse[..., None] + offs, m)  # (K, 2R+1)
    cand = polyline[cand_idx]  # (K, 2R+1, 2)
    d2r = jnp.sum((points[..., None, :] - cand) ** 2, axis=-1)
    j = jnp.argmin(d2r, axis=-1)
    idx = jnp.take_along_axis(cand_idx, j[..., None], -1)[..., 0]
    dist = jnp.sqrt(jnp.take_along_axis(d2r, j[..., None], -1)[..., 0])
    return dist, idx


def load_track_map(path: str | pathlib.Path) -> TrackMap:
    """Load a map from .npz (native) or the reference's pickled .npy dict
    (outside->left, inside->right renames, reference load.py:9-27)."""
    path = pathlib.Path(path)
    if path.suffix == ".npz":
        data = np.load(path)
        raw = {k: np.asarray(data[k]) for k in ("centre", "left", "right")}
    elif path.suffix == ".json":
        import json

        d = json.loads(path.read_text())
        raw = {
            "left": np.asarray(d["Outside"]),
            "right": np.asarray(d["Inside"]),
            "centre": np.asarray(d["Centre"]),
        }
    else:
        d = np.load(path, allow_pickle=True).item()

        def pick(*keys):
            for k in keys:
                if k in d:
                    return np.asarray(d[k])
            raise KeyError(f"none of {keys} in map file {path}")

        raw = {
            "left": pick("left", "outside_track", "outside"),
            "right": pick("right", "inside_track", "inside"),
            "centre": pick("centre", "centre_track"),
        }
    clean = {k: _remove_near_duplicates(v[:, :2].astype(np.float32)) for k, v in raw.items()}
    return TrackMap(
        centre=jnp.asarray(clean["centre"]),
        left=jnp.asarray(clean["left"]),
        right=jnp.asarray(clean["right"]),
    )


def save_track_map(path: str | pathlib.Path, centre, left, right):
    np.savez(
        path,
        centre=np.asarray(centre, np.float32),
        left=np.asarray(left, np.float32),
        right=np.asarray(right, np.float32),
    )
