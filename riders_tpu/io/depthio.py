"""Host-side image / depth-map IO.

Reproduces the on-disk interchange formats of the reference so that datasets,
checkpoints of intermediate stages, and outputs are bit-compatible:

* 16-bit (mode 'I') PNG depth maps with a x256 fixed-point codec
  (data/data_utils.py:94-143) and x2^14 response maps (:180-228).
* RGB images loaded as float32 (data/data_utils.py:59-90) or as
  [0,1]-normalized RGB (modules/midas/utils.py:98-114).
* n x 3 (u, v, depth) radar point lists as .npy, scattered to sparse maps
  (data/UTV_dataset.py:161-168).

All of this is host CPU work feeding the device input pipeline.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np
from PIL import Image

DEPTH_MULTIPLIER = 256.0
RESPONSE_MULTIPLIER = float(2 ** 14)


def load_image(path: str, normalize: bool = False) -> np.ndarray:
    """Load an RGB image as float32 HWC (data_utils.py:59-90)."""
    image = np.asarray(Image.open(path).convert("RGB"), np.float32)
    if normalize:
        image = image / 255.0
    return image


def read_image_unit(path: str) -> np.ndarray:
    """Load an RGB image in [0, 1], grayscale promoted to 3 channels
    (modules/midas/utils.py:98-114)."""
    return load_image(path, normalize=True)


def load_depth(path: str, multiplier: float = DEPTH_MULTIPLIER) -> np.ndarray:
    """Load a 16-bit PNG depth map; non-positive values zeroed
    (data_utils.py:94-125, UTV_dataset.py:14-17)."""
    z = np.array(Image.open(path), dtype=np.float32) / multiplier
    z[z <= 0] = 0.0
    return z


def save_depth(z: np.ndarray, path: str, multiplier: float = DEPTH_MULTIPLIER) -> None:
    """Save a depth map as 32-bit-integer-mode PNG with fixed-point codec
    (data_utils.py:128-143)."""
    depth = np.uint32(np.asarray(z) * multiplier)
    if depth.max(initial=0) <= np.iinfo(np.uint16).max:
        Image.fromarray(depth.astype(np.uint16)).save(path)
    else:
        Image.fromarray(depth.astype(np.int32), mode="I").save(path)


def load_response(path: str, multiplier: float = RESPONSE_MULTIPLIER) -> np.ndarray:
    """Load an RC-Net response map (data_utils.py:180-210)."""
    return np.array(Image.open(path), dtype=np.float32) / multiplier


def save_response(response: np.ndarray, path: str,
                  multiplier: float = RESPONSE_MULTIPLIER) -> None:
    """Save an RC-Net response map (data_utils.py:213-228)."""
    r = np.uint32(np.asarray(response) * multiplier)
    if r.max(initial=0) <= np.iinfo(np.uint16).max:
        Image.fromarray(r.astype(np.uint16)).save(path)
    else:
        Image.fromarray(r.astype(np.int32), mode="I").save(path)


def save_color_depth(z: np.ndarray, path: str,
                     max_depth: Optional[float] = None) -> None:
    """Save a viridis-colorized depth visualization (data_utils.py:146-177).

    Colormapping is done with a vendored viridis table to avoid a hard
    matplotlib dependency in the IO path.
    """
    z = np.asarray(z, np.float32)
    if max_depth is None:
        rng = np.max(z) - np.min(z)
        zn = (z - np.min(z)) / (rng if rng > 0 else 1.0)
    else:
        zn = np.clip(z, None, max_depth) / max_depth
    rgba = _viridis(zn)
    Image.fromarray(np.uint8(rgba * 255)).save(path)


def _viridis(x: np.ndarray) -> np.ndarray:
    """Viridis colormap lookup, x in [0, 1] -> RGBA float."""
    try:
        import matplotlib.pyplot as plt  # optional
        return plt.cm.viridis(x)
    except Exception:
        # 8-anchor linear approximation of viridis.
        anchors = np.array([
            [0.267, 0.005, 0.329], [0.283, 0.141, 0.458],
            [0.254, 0.265, 0.530], [0.207, 0.372, 0.553],
            [0.164, 0.471, 0.558], [0.128, 0.567, 0.551],
            [0.135, 0.659, 0.518], [0.267, 0.749, 0.441],
            [0.478, 0.821, 0.318], [0.741, 0.873, 0.150],
            [0.993, 0.906, 0.144]], np.float32)
        t = np.clip(x, 0.0, 1.0) * (len(anchors) - 1)
        i0 = np.floor(t).astype(np.int32)
        i1 = np.minimum(i0 + 1, len(anchors) - 1)
        w = (t - i0)[..., None]
        rgb = anchors[i0] * (1 - w) + anchors[i1] * w
        return np.concatenate([rgb, np.ones_like(rgb[..., :1])], axis=-1)


def load_radar_points(path: str, depth_shape: Optional[Tuple[int, int]] = None
                      ) -> np.ndarray:
    """Load radar returns as an (N, 3) float32 (u, v, depth) array.

    Accepts either an .npy point list or a sparse PNG depth map which is
    converted to a point list (data/datasets.py:184-192).
    """
    if path.endswith(".npy"):
        pts = np.load(path).astype(np.float32)
        if pts.ndim == 1:
            pts = pts[None, :]
        return pts
    depth_map = load_depth(path)
    v, u = np.where(depth_map > 0)
    z = depth_map[depth_map > 0]
    return np.column_stack([u, v, z]).astype(np.float32)


def scatter_points_to_map(points: np.ndarray,
                          shape: Tuple[int, int]) -> np.ndarray:
    """Scatter (u, v, depth) points onto an H x W sparse depth map
    (UTV_dataset.py:161-168): map[v, u] = depth."""
    out = np.zeros(shape, np.float32)
    for i in range(points.shape[0]):
        u, v, z = points[i, 0], points[i, 1], points[i, 2]
        if 0 <= int(v) < shape[0] and 0 <= int(u) < shape[1]:
            out[int(v), int(u)] = z
    return out


def pad_points(points: np.ndarray, max_points: int
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Pad/truncate a variable-length point list to a fixed bucket.

    Returns (points (max_points, 3), valid (max_points,) float32).  Static
    shapes are mandatory under jit; every consumer carries the mask.
    """
    n = min(points.shape[0], max_points)
    out = np.zeros((max_points, 3), np.float32)
    valid = np.zeros((max_points,), np.float32)
    out[:n] = points[:n]
    valid[:n] = 1.0
    return out, valid


def read_paths(filepath: str) -> list:
    """Read a newline-delimited path list (data_utils.py:18-40)."""
    with open(filepath) as f:
        return [line.rstrip("\n") for line in f if line.rstrip("\n")]


def write_paths(filepath: str, paths) -> None:
    """Write a newline-delimited path list (data_utils.py:43-56)."""
    with open(filepath, "w") as f:
        for p in paths:
            f.write(p + "\n")


def ensure_dir(path: str) -> str:
    os.makedirs(path, exist_ok=True)
    return path
