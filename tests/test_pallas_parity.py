"""Interpret-mode parity fuzzing for the Pallas kernels across both
dataset geometries (ZJU 240x100 and NTU 150x50 patches), verifying the
Pallas and XLA formulations agree everywhere the fused pipeline uses them.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from riders_tpu.ops.pallas.compose import compose_patches_pallas
from riders_tpu.ops.patches import compose_patches, roi_max_pool


@pytest.mark.parametrize("patch,img", [
    ((240, 100), (480, 640)),   # ZJU
    ((150, 50), (512, 640)),    # NTU
])
def test_compose_parity_both_geometries(rng, patch, img):
    ph, pw = patch
    H, W = img
    B, K = 1, 5
    resp = rng.random((B, K, ph, pw)).astype(np.float32)
    pts = np.stack([rng.integers(0, W + pw, (B, K)),
                    rng.integers(0, H + ph, (B, K)),
                    rng.random((B, K)) * 50 + 1], -1).astype(np.float32)
    mask = np.ones((B, K), np.float32)

    d1, r1 = compose_patches_pallas(
        jnp.asarray(resp), jnp.asarray(pts), jnp.asarray(mask), img, patch,
        0.4, interpret=True)
    d2, r2 = jax.vmap(lambda a, b, c: compose_patches(
        a, b, c, img, patch, 0.4))(jnp.asarray(resp), jnp.asarray(pts),
                                   jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-6)


def test_compose_parity_vmem_exceeding_batch(rng):
    """Batch 20 at the ZJU geometry: the configuration whose full-frame
    output blocks + canvases exceeded the 16 MB scoped-VMEM limit before
    the banded-emit restructure (PERF.md round 5).  Interpret-mode
    correctness here + the driver bench compiling it on hardware pin the
    fix; per-frame thresholds exercise the threshold broadcast."""
    patch, img = (240, 100), (480, 640)
    ph, pw = patch
    H, W = img
    B, K = 20, 4
    resp = rng.random((B, K, ph, pw)).astype(np.float32)
    pts = np.stack([rng.integers(0, W + pw, (B, K)),
                    rng.integers(0, H + ph, (B, K)),
                    rng.random((B, K)) * 50 + 1], -1).astype(np.float32)
    mask = (rng.random((B, K)) > 0.2).astype(np.float32)
    thr = (0.2 + 0.4 * rng.random(B)).astype(np.float32)

    d1, r1 = compose_patches_pallas(
        jnp.asarray(resp), jnp.asarray(pts), jnp.asarray(mask), img, patch,
        jnp.asarray(thr), interpret=True)
    d2, r2 = jax.vmap(lambda a, b, c, t: compose_patches(
        a, b, c, img, patch, t))(jnp.asarray(resp), jnp.asarray(pts),
                                 jnp.asarray(mask), jnp.asarray(thr))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-6)


@pytest.mark.parametrize("patch,scale,out_size,feat", [
    # ZJU pyramid levels on the padded 720x740 frame
    ((240, 100), 0.5, (120, 50), (360, 370, 8)),
    ((240, 100), 1 / 32., (7, 3), (23, 24, 16)),
    # NTU pyramid levels on the padded 662x690 frame
    ((150, 50), 0.25, (37, 12), (166, 173, 8)),
    ((150, 50), 1 / 16., (9, 3), (42, 44, 16)),
])
def test_roi_pool_parity_both_geometries(rng, patch, scale, out_size, feat):
    from riders_tpu.ops.pallas.roi_pool import roi_max_pool_pallas
    H, W, C = feat
    B, K = 1, 6
    ph, pw = patch
    img_h = int(H / scale)
    img_w = int(W / scale)
    f = rng.standard_normal((B, H, W, C)).astype(np.float32)
    cx = rng.integers(pw // 2, img_w - pw // 2, (B, K))
    cy = rng.integers(ph // 2, img_h - ph // 2, (B, K))
    boxes = np.stack([cx - pw // 2, cy - ph // 2,
                      cx + pw // 2, cy + ph // 2], -1).astype(np.float32)

    ours = roi_max_pool_pallas(jnp.asarray(f), jnp.asarray(boxes), scale,
                               out_size, patch, interpret=True)
    ref = jax.vmap(lambda fb, bb: roi_max_pool(
        fb, bb, scale, out_size, patch))(jnp.asarray(f), jnp.asarray(boxes))
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))


@pytest.mark.parametrize("patch,scale,out_size,feat", [
    # ZJU pyramid levels on the padded 720x740 frame
    ((240, 100), 0.5, (120, 50), (360, 370, 8)),
    ((240, 100), 1 / 32., (7, 3), (23, 24, 16)),
    # NTU pyramid levels on the padded 662x690 frame
    ((150, 50), 0.25, (37, 12), (166, 173, 8)),
    ((150, 50), 1 / 16., (9, 3), (42, 44, 16)),
])
def test_roi_pool_4d_parity_both_geometries(rng, patch, scale, out_size,
                                            feat):
    """The 4D-native kernel (no flat relayout) must match the XLA
    formulation exactly, like the flat kernel."""
    from riders_tpu.ops.pallas.roi_pool import roi_max_pool_pallas4d
    H, W, C = feat
    B, K = 1, 6
    ph, pw = patch
    img_h = int(H / scale)
    img_w = int(W / scale)
    f = rng.standard_normal((B, H, W, C)).astype(np.float32)
    cx = rng.integers(pw // 2, img_w - pw // 2, (B, K))
    cy = rng.integers(ph // 2, img_h - ph // 2, (B, K))
    boxes = np.stack([cx - pw // 2, cy - ph // 2,
                      cx + pw // 2, cy + ph // 2], -1).astype(np.float32)

    ours = roi_max_pool_pallas4d(jnp.asarray(f), jnp.asarray(boxes), scale,
                                 out_size, patch, interpret=True)
    ref = jax.vmap(lambda fb, bb: roi_max_pool(
        fb, bb, scale, out_size, patch))(jnp.asarray(f), jnp.asarray(boxes))
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))


def test_roi_pool_4d_true_hw_canvas(rng):
    """The 4D kernel consuming a pre-padded _NEG canvas (the stem kernel's
    output form) must match the plain 4D call on the unpadded feature."""
    from riders_tpu.ops.pallas.roi_pool import (
        _NEG, roi_max_pool_pallas4d, roi_window_pad)
    patch, scale, out_size = (240, 100), 0.5, (120, 50)
    H, W, C = 360, 370, 8
    B, K = 2, 5
    ph, pw = patch
    img_h, img_w = int(H / scale), int(W / scale)
    f = rng.standard_normal((B, H, W, C)).astype(np.float32)
    win_h, win_w = roi_window_pad(patch, scale, C)
    canvas = np.full((B, H + win_h, W + win_w, C), _NEG, np.float32)
    canvas[:, :H, :W] = f
    cx = rng.integers(pw // 2, img_w - pw // 2, (B, K))
    cy = rng.integers(ph // 2, img_h - ph // 2, (B, K))
    boxes = np.stack([cx - pw // 2, cy - ph // 2,
                      cx + pw // 2, cy + ph // 2], -1).astype(np.float32)

    ours = roi_max_pool_pallas4d(jnp.asarray(canvas), jnp.asarray(boxes),
                                 scale, out_size, patch, interpret=True,
                                 true_hw=(H, W))
    ref = roi_max_pool_pallas4d(jnp.asarray(f), jnp.asarray(boxes), scale,
                                out_size, patch, interpret=True)
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))


def test_roi_pool_4d_boxes_at_image_edges(rng):
    """Boundary clamp parity for the 4D kernel."""
    from riders_tpu.ops.pallas.roi_pool import roi_max_pool_pallas4d
    patch, scale, out_size = (48, 32), 0.5, (24, 16)
    H, W, C = 64, 48, 8
    f = rng.standard_normal((1, H, W, C)).astype(np.float32)
    boxes = np.asarray([[[0, 0, 32, 48]],
                        [[64, 80, 96, 128]]],
                       np.float32).reshape(1, 2, 4)
    ours = roi_max_pool_pallas4d(jnp.asarray(f), jnp.asarray(boxes), scale,
                                 out_size, patch, interpret=True)
    ref = jax.vmap(lambda fb, bb: roi_max_pool(
        fb, bb, scale, out_size, patch))(jnp.asarray(f), jnp.asarray(boxes))
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))


@pytest.mark.parametrize("patch,scale,out_size,feat", [
    # ZJU pyramid levels on the padded 720x740 frame (shrunk extents)
    ((240, 100), 0.5, (120, 50), (360, 370, 8)),
    ((240, 100), 1 / 32., (7, 3), (23, 24, 16)),
    # NTU pyramid levels
    ((150, 50), 0.25, (37, 12), (166, 173, 8)),
    ((150, 50), 1 / 16., (9, 3), (42, 44, 16)),
])
def test_roi_pool_gradient_parity(rng, patch, scale, out_size, feat):
    """The custom-VJP Pallas backward must match the XLA formulation's
    autograd (scatter of each bin's cotangent to the bin argmax)."""
    from riders_tpu.ops.pallas.roi_pool import roi_max_pool_pallas_diff
    H, W, C = feat
    B, K = 1, 4
    ph, pw = patch
    img_h, img_w = int(H / scale), int(W / scale)
    f = rng.standard_normal((B, H, W, C)).astype(np.float32)
    cx = rng.integers(pw // 2, img_w - pw // 2, (B, K))
    cy = rng.integers(ph // 2, img_h - ph // 2, (B, K))
    boxes = np.stack([cx - pw // 2, cy - ph // 2,
                      cx + pw // 2, cy + ph // 2], -1).astype(np.float32)
    w = rng.standard_normal(
        (B, K, *out_size, C)).astype(np.float32)

    def loss_pallas(feat_in):
        out = roi_max_pool_pallas_diff(
            feat_in, jnp.asarray(boxes), scale, out_size, patch,
            interpret=True)
        return jnp.sum(out * w)

    def loss_xla(feat_in):
        out = jax.vmap(lambda fb, bb: roi_max_pool(
            fb, bb, scale, out_size, patch))(feat_in, jnp.asarray(boxes))
        return jnp.sum(out * w)

    g1 = jax.grad(loss_pallas)(jnp.asarray(f))
    g2 = jax.grad(loss_xla)(jnp.asarray(f))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=1e-5, rtol=1e-5)


def test_roi_pool_gradient_overlapping_boxes(rng):
    """Overlapping windows accumulate through the serialized RMW path."""
    from riders_tpu.ops.pallas.roi_pool import roi_max_pool_pallas_diff
    patch, scale, out_size = (48, 32), 0.5, (24, 16)
    H, W, C = 64, 48, 8
    f = rng.standard_normal((1, H, W, C)).astype(np.float32)
    # Identical + near-identical boxes: every window overlaps.
    boxes = np.asarray([[[10, 12, 42, 60], [10, 12, 42, 60],
                         [12, 14, 44, 62]]], np.float32)
    w = rng.standard_normal((1, 3, *out_size, C)).astype(np.float32)

    g1 = jax.grad(lambda x: jnp.sum(roi_max_pool_pallas_diff(
        x, jnp.asarray(boxes), scale, out_size, patch,
        interpret=True) * w))(jnp.asarray(f))
    g2 = jax.grad(lambda x: jnp.sum(jax.vmap(lambda fb, bb: roi_max_pool(
        fb, bb, scale, out_size, patch))(x, jnp.asarray(boxes)) * w))(
            jnp.asarray(f))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=1e-5, rtol=1e-5)


def test_roi_pool_boxes_at_image_edges(rng):
    """Boxes whose scaled windows touch the feature boundary must clamp the
    same way in both formulations."""
    from riders_tpu.ops.pallas.roi_pool import roi_max_pool_pallas
    patch, scale, out_size = (48, 32), 0.5, (24, 16)
    H, W, C = 64, 48, 8
    f = rng.standard_normal((1, H, W, C)).astype(np.float32)
    boxes = np.asarray([[[0, 0, 32, 48]],          # top-left corner
                        [[64, 80, 96, 128]]],      # past the bottom-right
                       np.float32).reshape(1, 2, 4)
    ours = roi_max_pool_pallas(jnp.asarray(f), jnp.asarray(boxes), scale,
                               out_size, patch, interpret=True)
    ref = jax.vmap(lambda fb, bb: roi_max_pool(
        fb, bb, scale, out_size, patch))(jnp.asarray(f), jnp.asarray(boxes))
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))


@pytest.mark.parametrize("H,W,scale,out_size,box", [
    (80, 100, 0.5, (24, 10), (48, 20)),   # ZJU-like ratios
    (61, 87, 0.5, (15, 5), (30, 10)),     # NTU-like odd sizes
])
def test_roi_pool_foldw_parity(rng, H, W, scale, out_size, box):
    """The W-FOLDED RoI pool kernel (consumes the stem's fold_w canvas,
    PERF.md round 4) vs the XLA formulation, including edge boxes and a
    residue-exercising x offset."""
    from riders_tpu.ops.patches import _max_roi, roi_max_pool
    from riders_tpu.ops.pallas.roi_pool import (
        _NEG, roi_max_pool_pallas_foldw, roi_window_pad_folded,
        unfold_pooled)

    C, B, K = 32, 1, 8
    feat = rng.standard_normal((B, H, W, C)).astype(np.float32)
    x1 = rng.integers(-box[1] // 2, W - box[1] // 2, (B, K))
    y1 = rng.integers(-box[0] // 2, H - box[0] // 2, (B, K))
    x1[0, :4] = [0, W - box[1], W - box[1] // 2, 33]
    y1[0, :4] = [0, H - box[0], H - box[0] // 2, 7]
    boxes = np.stack([x1, y1, x1 + box[1], y1 + box[0]], -1
                     ).astype(np.float32)

    win_h, win_w = roi_window_pad_folded(box, scale, C)
    R = H + win_h
    Wo2 = -(-(W + win_w) // 8) * 8
    canvas = np.full((B, R, Wo2, C), _NEG, np.float32)
    canvas[:, :H, :W] = feat
    folded = canvas.reshape(B, R, Wo2 // 4, 4, C).reshape(
        B, R, Wo2 // 4, 4 * C)

    ref = jax.vmap(lambda f, b: roi_max_pool(f, b, scale, out_size, box))(
        jnp.asarray(feat), jnp.asarray(boxes))
    got = roi_max_pool_pallas_foldw(
        jnp.asarray(folded), jnp.asarray(boxes), scale, out_size, box,
        true_hw=(H, W), channels=C, interpret=True)
    gotu = unfold_pooled(got, out_size[1], C)
    np.testing.assert_allclose(np.asarray(gotu), np.asarray(ref),
                               atol=1e-5)
