"""Parity tests for riders_tpu.ops.resize against torch / cv2 references.

The reference pipeline depends on four interpolation conventions
(see ops/resize.py docstring); each is checked bit-for-bit (nearest) or to
fp32 tolerance (linear/cubic) against torch.nn.functional.interpolate and
cv2.resize.
"""

import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn.functional as F

from riders_tpu.ops.resize import resize2d


def _torch_resize(x_hwc, size, mode, align_corners=None):
    t = torch.from_numpy(np.ascontiguousarray(
        np.transpose(x_hwc, (2, 0, 1))[None]))
    if mode == "nearest":
        y = F.interpolate(t, size=size, mode="nearest")
    else:
        y = F.interpolate(t, size=size, mode=mode, align_corners=align_corners)
    return np.transpose(y.numpy()[0], (1, 2, 0))


@pytest.mark.parametrize("in_shape,out_shape", [
    ((480, 640), (288, 384)),
    ((37, 53), (74, 106)),
    ((64, 64), (17, 29)),
])
def test_nearest_matches_torch(rng, in_shape, out_shape):
    x = rng.standard_normal((*in_shape, 3)).astype(np.float32)
    ours = np.asarray(resize2d(jnp.asarray(x), out_shape, "nearest"))
    theirs = _torch_resize(x, out_shape, "nearest")
    np.testing.assert_array_equal(ours, theirs)


def test_nearest_matches_cv2(rng):
    import cv2
    x = rng.standard_normal((480, 640, 3)).astype(np.float32)
    ours = np.asarray(resize2d(jnp.asarray(x), (288, 384), "nearest"))
    theirs = cv2.resize(x, (384, 288), interpolation=cv2.INTER_NEAREST)
    np.testing.assert_array_equal(ours, theirs)


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("in_shape,out_shape", [
    ((9, 12), (18, 24)),
    ((72, 96), (144, 192)),
    ((31, 47), (62, 94)),
    ((50, 60), (23, 31)),   # downsample
])
def test_bilinear_matches_torch(rng, in_shape, out_shape, align_corners):
    x = rng.standard_normal((*in_shape, 4)).astype(np.float32)
    ours = np.asarray(resize2d(jnp.asarray(x), out_shape, "bilinear",
                               align_corners=align_corners))
    theirs = _torch_resize(x, out_shape, "bilinear", align_corners)
    np.testing.assert_allclose(ours, theirs, atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("in_shape,out_shape", [
    ((288, 384), (480, 640)),   # the val_zju.py:200-210 upsample
    ((17, 23), (51, 69)),
])
def test_bicubic_matches_torch(rng, in_shape, out_shape):
    x = rng.standard_normal((*in_shape, 1)).astype(np.float32)
    ours = np.asarray(resize2d(jnp.asarray(x), out_shape, "bicubic",
                               align_corners=False))
    theirs = _torch_resize(x, out_shape, "bicubic", False)
    np.testing.assert_allclose(ours, theirs, atol=5e-5, rtol=1e-4)


def test_identity_passthrough(rng):
    x = rng.standard_normal((32, 32, 3)).astype(np.float32)
    out = resize2d(jnp.asarray(x), (32, 32), "bilinear")
    np.testing.assert_array_equal(np.asarray(out), x)


def test_batched_leading_dims(rng):
    x = rng.standard_normal((2, 5, 16, 16, 3)).astype(np.float32)
    out = resize2d(jnp.asarray(x), (32, 32), "bilinear", align_corners=True)
    assert out.shape == (2, 5, 32, 32, 3)
    one = resize2d(jnp.asarray(x[0, 0]), (32, 32), "bilinear",
                   align_corners=True)
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(one),
                               atol=1e-6)
