"""Parity tests: outlier removal / dilation / losses vs torch references."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from riders_tpu.ops.losses import (
    masked_median,
    sml_loss,
    sobel_filters,
    sobel_smoothness_loss,
    weighted_bce_with_logits,
)
from riders_tpu.ops.outlier import dilate_max, remove_outliers


def _torch_remove_outliers(depth, kernel_size=7, threshold=1.5):
    """Transliteration of utils/net_utils.py:591-638 for golden values."""
    d = torch.from_numpy(depth)[None, None]
    validity = torch.where(d > 0.0, torch.ones_like(d), d)
    max_value = 10 * torch.max(d)
    filled = torch.where(validity <= 0, torch.full_like(d, max_value), d)
    pad = kernel_size // 2
    filled = F.pad(filled, (pad, pad, pad, pad), mode="constant",
                   value=max_value)
    mins = -F.max_pool2d(-filled, kernel_size, stride=1)
    keep = torch.where(mins < d - threshold, torch.zeros_like(validity),
                       torch.ones_like(validity))
    return (d * keep).numpy()[0, 0]


def test_remove_outliers_matches_reference(rng):
    depth = np.zeros((40, 50), np.float32)
    idx = rng.integers(0, 40 * 50, 120)
    depth.reshape(-1)[idx] = rng.random(120).astype(np.float32) * 30 + 1
    ref = _torch_remove_outliers(depth, 7, 1.5)
    ours = np.asarray(remove_outliers(jnp.asarray(depth)[None, ..., None]
                                      .transpose((0, 3, 1, 2)), 7, 1.5))
    np.testing.assert_allclose(ours[0, 0], ref, rtol=1e-6)


def test_dilate_max_matches_torch(rng):
    depth = (rng.random((1, 1, 20, 24)) * 10).astype(np.float32)
    ref = F.max_pool2d(torch.from_numpy(depth), 3, stride=1, padding=1).numpy()
    ours = np.asarray(dilate_max(jnp.asarray(depth), 3))
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_sobel_filters_match_reference():
    """Golden check against the handcrafted torch filters (loss.py:260-274)."""
    def torch_sobel(size):
        fs = [1, 1, size, size]
        gx = torch.ones(fs)
        gy = torch.ones(fs)
        gx[:, :, :, fs[-1] // 2] = 0
        gx[:, :, fs[-2] // 2, fs[-1] // 2 - 1] = 2
        gx[:, :, fs[-2] // 2, fs[-1] // 2 + 1] = 2
        gx[:, :, :, fs[-1] // 2:] = -1 * gx[:, :, :, fs[-1] // 2:]
        gy[:, :, fs[-2] // 2, :] = 0
        gy[:, :, fs[-2] // 2 - 1, fs[-1] // 2] = 2
        gy[:, :, fs[-2] // 2 + 1, fs[-1] // 2] = 2
        gy[:, :, fs[-2] // 2 + 1:, :] = -1 * gy[:, :, fs[-2] // 2 + 1:, :]
        return gx.numpy()[0, 0], gy.numpy()[0, 0]

    for size in (3, 7):
        gx_ref, gy_ref = torch_sobel(size)
        gx, gy = sobel_filters(size)
        np.testing.assert_array_equal(gx, gx_ref)
        np.testing.assert_array_equal(gy, gy_ref)


def _torch_sobel_loss(predict, image, weights, size):
    """Transliteration of utils/loss.py:187-252 (NCHW torch) for goldens."""
    p = torch.from_numpy(predict)
    im = torch.from_numpy(image)
    w = torch.from_numpy(weights)

    def filt(s):
        gx, gy = sobel_filters(s)
        return (torch.from_numpy(gx)[None, None],
                torch.from_numpy(gy)[None, None])

    gx, gy = filt(size)
    gxs, gys = filt(3)
    pad = size // 2
    im_pad = F.pad(im, (pad, pad, pad, pad), mode="replicate")
    im_smooth = F.pad(im, (1, 1, 1, 1), mode="replicate")
    p_pad = F.pad(p, (pad, pad, pad, pad), mode="replicate")
    image_dy = F.conv2d(im_pad, gy)
    image_dx = F.conv2d(im_pad, gx)
    ims_dy = F.conv2d(im_smooth, gys)
    ims_dx = F.conv2d(im_smooth, gxs)
    p_dy = F.conv2d(p_pad, gy)
    p_dx = F.conv2d(p_pad, gx)
    wx = torch.exp(-torch.mean(torch.abs(ims_dy), dim=1, keepdim=True))
    wy = torch.exp(-torch.mean(torch.abs(ims_dx), dim=1, keepdim=True))
    sx = torch.mean(w * wx * torch.abs(p_dx))
    sy = torch.mean(w * wy * torch.abs(p_dy))
    smooth = (sx + sy) / float(size * size)
    ldx = torch.mean(w * torch.abs(abs(p_dx) - abs(image_dx)))
    ldy = torch.mean(w * torch.abs(abs(p_dy) - abs(image_dy)))
    edge = (ldx + ldy) / float(size * size)
    return float(smooth), float(edge)


def test_sobel_smoothness_matches_reference(rng):
    predict = rng.random((2, 1, 32, 40)).astype(np.float32)
    image = rng.random((2, 1, 32, 40)).astype(np.float32)
    weights = np.ones((2, 1, 32, 40), np.float32)
    ref_s, ref_e = _torch_sobel_loss(predict, image, weights, 7)
    ours_s, ours_e = sobel_smoothness_loss(
        jnp.asarray(predict.transpose(0, 2, 3, 1)),
        jnp.asarray(image.transpose(0, 2, 3, 1)),
        jnp.asarray(weights.transpose(0, 2, 3, 1)), 7)
    np.testing.assert_allclose(float(ours_s), ref_s, rtol=2e-3)
    np.testing.assert_allclose(float(ours_e), ref_e, rtol=2e-3)


def test_weighted_bce_matches_torch(rng):
    logits = rng.standard_normal((3, 1, 10, 12)).astype(np.float32)
    target = (rng.random((3, 1, 10, 12)) > 0.7).astype(np.float32)
    validity = (rng.random((3, 1, 10, 12)) > 0.3).astype(np.float32)
    w_pos = 2.5

    ref = F.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(target),
        reduction="none", pos_weight=torch.tensor(w_pos))
    ref = float((torch.from_numpy(validity) * ref).sum()
                / torch.from_numpy(validity).sum())
    ours = float(weighted_bce_with_logits(
        jnp.asarray(logits), jnp.asarray(target), jnp.asarray(validity),
        w_pos))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_masked_median_matches_torch(rng):
    x = rng.standard_normal((7, 9)).astype(np.float32)
    mask = (rng.random((7, 9)) > 0.4).astype(np.float32)
    ref = float(torch.median(torch.from_numpy(x)[torch.from_numpy(mask) > 0]))
    ours = float(masked_median(jnp.asarray(x), jnp.asarray(mask)))
    np.testing.assert_allclose(ours, ref)


def test_sml_loss_matches_reference_semantics(rng):
    """Check the supervised + lidar branch against a torch transliteration
    of utils/loss.py:26-124 (single scale, l1, no smoothness)."""
    pred = (rng.random((2, 1, 16, 20)) * 10).astype(np.float32)
    gt_interp = (rng.random((2, 1, 16, 20)) * 10).astype(np.float32)
    gt_interp[gt_interp < 3] = 0
    gt_sparse = np.where(rng.random((2, 1, 16, 20)) > 0.9, gt_interp, 0
                         ).astype(np.float32)
    w_lidar = 1.5

    gi = torch.from_numpy(gt_interp.copy())
    gs = torch.from_numpy(gt_sparse)
    p = torch.from_numpy(pred)
    mask_sparse = torch.where(gs > 0, torch.zeros_like(gs),
                              torch.ones_like(gs))
    gi = gi * mask_sparse
    vm_gt = gi > 0
    vm_lidar = gs > 0
    ref = float(F.l1_loss(p[vm_gt], gi[vm_gt])
                + w_lidar * F.l1_loss(p[vm_lidar], gs[vm_lidar]))

    loss, info = sml_loss(
        image=jnp.asarray(pred.transpose(0, 2, 3, 1)),
        output_depth=jnp.asarray(pred.transpose(0, 2, 3, 1)),
        gt_interp=jnp.asarray(gt_interp.transpose(0, 2, 3, 1)),
        gt_sparse=jnp.asarray(gt_sparse.transpose(0, 2, 3, 1)),
        loss_func="l1", w_smoothness=0.0, w_lidar_loss=w_lidar)
    np.testing.assert_allclose(float(loss), ref, rtol=1e-5)
