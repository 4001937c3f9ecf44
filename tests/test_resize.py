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


def test_compute_net_shape_methods():
    """Aspect-keeping multiple-of-32 resize policies (transforms.py:70-125
    via compute_net_shape): minimal / lower_bound / upper_bound."""
    from riders_tpu.ops.resize import compute_net_shape

    assert compute_net_shape((480, 640), 288, method="minimal") == (288, 384)
    assert compute_net_shape((512, 640), 288, method="minimal") == (288, 352)
    lb = compute_net_shape((512, 640), 288, method="lower_bound")
    assert lb[0] >= 288 and lb[1] >= 288
    ub = compute_net_shape((512, 640), 384, method="upper_bound")
    assert ub[0] <= 384 and ub[1] <= 384
    # reference arithmetic: scale = min(384/512, 384/640) = 0.6 ->
    # (307.2, 384) -> round-to-32 = (320, 384); 320 <= 384 so it stands
    assert ub == (320, 384)


def test_test_time_transform_tables():
    """Per-mono-model test-time tables (transforms_test.py:240-325 +
    normalization.py VOID_INTERMEDIATE)."""
    from riders_tpu.core.normalization import (VOID_INTERMEDIATE,
                                               apply_to_config,
                                               test_time_transforms)

    assert set(VOID_INTERMEDIATE) == {
        "dpt_beit_large_512", "dpt_swin2_large_384", "dpt_large",
        "dpt_hybrid", "dpt_swin2_tiny_256", "dpt_levit_224", "midas_small"}
    row = VOID_INTERMEDIATE["midas_small"]["void_1500"]
    assert row["mean"]["int_depth"] == 0.728
    assert row["std"]["int_scales"] == 0.140

    spec = test_time_transforms("midas_small", "void", 150, (480, 640))
    assert spec.depth_model_image_mean == (0.485, 0.456, 0.406)
    assert spec.int_depth_mean == 0.723
    assert spec.sml_net_shape[0] <= 384 and spec.sml_net_shape[1] <= 384

    # fixed-square predictors ignore aspect
    spec2 = test_time_transforms("dpt_levit_224", "void", 500, (480, 640))
    assert spec2.depth_model_net_shape == (224, 224)
    assert spec2.int_scales_mean == 0.410

    from riders_tpu.core.config import zju_config
    cfg = apply_to_config(zju_config(), spec)
    assert cfg.sml.net_shape == spec.sml_net_shape
    assert cfg.sml.int_depth_mean == 0.723

    import pytest
    with pytest.raises(KeyError):
        test_time_transforms("nonexistent", "void", 150, (480, 640))


def test_edge_pad2d_matches_jnp_pad(rng):
    from riders_tpu.ops.resize import edge_pad2d
    x = rng.standard_normal((2, 9, 11, 3)).astype(np.float32)
    ref = np.pad(x, ((0, 0), (4, 4), (5, 5), (0, 0)), mode="edge")
    got = np.asarray(edge_pad2d(jnp.asarray(x), 4, 5))
    np.testing.assert_array_equal(got, ref)
    # bf16 path: one-hot selection stays exact
    got16 = np.asarray(edge_pad2d(jnp.asarray(x, jnp.bfloat16), 2, 3))
    ref16 = np.pad(np.asarray(jnp.asarray(x, jnp.bfloat16), np.float32),
                   ((0, 0), (2, 2), (3, 3), (0, 0)), mode="edge")
    np.testing.assert_array_equal(got16.astype(np.float32), ref16)
