"""Parity tests: roi_max_pool vs torchvision.ops.roi_pool and patch
composition vs a transliteration of rcnet_main.forward_output:460-487."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from riders_tpu.ops.patches import (
    adaptive_compose,
    compose_patches,
    roi_max_pool,
    roi_pool_pyramid,
)

PATCH = (240, 100)


def _make_boxes(rng, n, img_h, img_w, patch=PATCH):
    ph, pw = patch
    cx = rng.integers(pw // 2, img_w - pw // 2, n)
    cy = rng.integers(ph // 2, img_h - ph // 2, n)
    return np.stack([cx - pw // 2, cy - ph // 2,
                     cx + pw // 2, cy + ph // 2], axis=1).astype(np.float32)


def _np_roi_pool(feat_hwc, boxes, scale, out_size):
    """Numpy implementation of the torchvision roi_pool algorithm (round
    half away from zero, legacy +1 roi extent, floor/ceil bins clamped to
    the feature, empty bin -> 0).  torchvision itself is not in this image;
    this transliterates the documented CUDA/C++ kernel semantics."""
    H, W, C = feat_hwc.shape
    out_h, out_w = out_size
    out = np.zeros((len(boxes), out_h, out_w, C), np.float32)
    rnd = lambda v: int(math.floor(v * scale + 0.5))
    for bi, (x1, y1, x2, y2) in enumerate(boxes):
        rs_w, rs_h, re_w, re_h = rnd(x1), rnd(y1), rnd(x2), rnd(y2)
        roi_w = max(re_w - rs_w + 1, 1)
        roi_h = max(re_h - rs_h + 1, 1)
        # Exact rational bin boundaries (torchvision computes these in fp32,
        # which drifts by one row at exact-integer boundaries depending on
        # the device's division rounding; riders_tpu uses integer math).
        for ph in range(out_h):
            hs = min(max(ph * roi_h // out_h + rs_h, 0), H)
            he = min(max(-((-(ph + 1) * roi_h) // out_h) + rs_h, 0), H)
            for pw in range(out_w):
                ws = min(max(pw * roi_w // out_w + rs_w, 0), W)
                we = min(max(-((-(pw + 1) * roi_w) // out_w) + rs_w, 0), W)
                if he > hs and we > ws:
                    out[bi, ph, pw] = feat_hwc[hs:he, ws:we].max(axis=(0, 1))
    return out


@pytest.mark.parametrize("scale,out_size", [
    (1.0 / 2.0, (120, 50)),
    (1.0 / 8.0, (30, 12)),
    (1.0 / 32.0, (7, 3)),
])
def test_roi_max_pool_matches_reference(rng, scale, out_size):
    img_h, img_w = 720, 740            # ZJU frame after edge padding
    feat_h = int(np.ceil(img_h * scale))
    feat_w = int(np.ceil(img_w * scale))
    feat = rng.standard_normal((feat_h, feat_w, 8)).astype(np.float32)
    boxes = _make_boxes(rng, 12, img_h, img_w)

    ref = _np_roi_pool(feat, boxes, scale, out_size)
    ours = np.asarray(roi_max_pool(jnp.asarray(feat), jnp.asarray(boxes),
                                   scale, out_size, PATCH))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_roi_pool_pyramid_shapes(rng):
    latent = rng.standard_normal((23, 24, 128)).astype(np.float32)
    skips = [rng.standard_normal((360, 370, 32)).astype(np.float32),
             rng.standard_normal((180, 185, 64)).astype(np.float32),
             rng.standard_normal((90, 93, 128)).astype(np.float32),
             rng.standard_normal((45, 47, 128)).astype(np.float32)]
    boxes = _make_boxes(rng, 5, 720, 740)
    lat, sks = roi_pool_pyramid(jnp.asarray(latent),
                                [jnp.asarray(s) for s in skips],
                                jnp.asarray(boxes), PATCH)
    assert lat.shape == (5, 7, 3, 128)
    assert [tuple(s.shape) for s in sks] == [
        (5, 120, 50, 32), (5, 60, 25, 64), (5, 30, 12, 128), (5, 15, 6, 128)]


def _reference_compose(responses, points, img_shape, patch, thr):
    """Transliteration of rcnet_main.py:460-487 in numpy."""
    H, W = img_shape
    ph, pw = patch
    pad_y, pad_x = ph // 2, pw // 2
    Hp, Wp = H + 2 * pad_y, W + 2 * pad_x
    tiles = []
    for crop, (u, v, z) in zip(responses, points):
        canvas = np.zeros((Hp, Wp), np.float32)
        crop = np.where(crop < thr, 0.0, crop)
        canvas[int(v) - pad_y:int(v) + pad_y,
               int(u) - pad_x:int(u) + pad_x] = crop
        tiles.append(canvas)
    tiles = np.stack(tiles)[:, pad_y:-pad_y, pad_x:-pad_x]
    response = tiles.max(axis=0)
    z = points[:, 2][:, None, None]
    with np.errstate(invalid="ignore"):
        depth = (tiles * z).sum(0) / tiles.sum(0)
    depth = np.where(tiles.max(0) == 0, 0.0, depth)
    return np.nan_to_num(depth), response


def test_compose_matches_reference(rng):
    H, W = 120, 160
    patch = (40, 20)
    K = 6
    pad_y, pad_x = patch[0] // 2, patch[1] // 2
    responses = rng.random((K, *patch)).astype(np.float32)
    u = rng.integers(pad_x, W + pad_x, K)
    v = rng.integers(pad_y, H + pad_y, K)
    z = (rng.random(K) * 50 + 1).astype(np.float32)
    points = np.stack([u, v, z], axis=1).astype(np.float32)

    ref_depth, ref_resp = _reference_compose(
        responses, points, (H, W), patch, 0.5)
    depth, resp = compose_patches(
        jnp.asarray(responses), jnp.asarray(points),
        jnp.ones(K, np.float32), (H, W), patch, 0.5)
    np.testing.assert_allclose(np.asarray(resp), ref_resp, atol=1e-6)
    np.testing.assert_allclose(np.asarray(depth), ref_depth, atol=1e-4)


def test_compose_respects_point_mask(rng):
    patch = (10, 10)
    responses = np.ones((2, 10, 10), np.float32)
    points = np.array([[10, 10, 5.0], [20, 20, 9.0]], np.float32)
    mask = np.array([1.0, 0.0], np.float32)
    depth, resp = compose_patches(
        jnp.asarray(responses), jnp.asarray(points), jnp.asarray(mask),
        (30, 30), patch, 0.5)
    d = np.asarray(depth)
    assert d.max() == 5.0           # masked point contributes nothing
    assert (d == 9.0).sum() == 0


def test_adaptive_threshold_decay():
    """Responses all below the initial threshold: the retry loop must lower
    it until a depth appears (run_rcnet_zju.py:254-264)."""
    patch = (10, 10)
    responses = np.full((1, 10, 10), 0.3, np.float32)
    points = np.array([[15, 15, 7.0]], np.float32)
    depth, resp, thr = adaptive_compose(
        jnp.asarray(responses), jnp.asarray(points),
        jnp.ones(1, np.float32), (30, 30), patch,
        response_threshold=0.5, threshold_decay=0.05, max_retries=8)
    assert np.asarray(depth).max() == 7.0
    assert float(thr) == pytest.approx(0.3, abs=0.051)
