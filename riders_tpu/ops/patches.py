"""Fixed-size RoI feature pooling and tiled patch composition.

TPU-native replacement for the two native ops at the heart of RC-Net:

* ``roi_max_pool`` replaces torchvision.ops.roi_pool (C++/CUDA), used on the
  latent and every skip scale (RCNet/networks.py:418-433).  Because every
  RC-Net box is exactly `patch_size` and output sizes equal
  int(patch * scale), each pooling bin spans at most 2 feature rows/cols;
  the pool reduces to a dynamic-slice crop plus a two-tap gather max -
  XLA-friendly, no scatter, vmappable over points.
* ``compose_patches`` replaces the host paste-back loop of
  rcnet_main.forward_output:460-487: thresholded per-point response crops
  are composited into a full-resolution map (max response) and a
  confidence-weighted depth average, via a lax.scan of windowed
  accumulator updates (no K x H x W intermediate).

torchvision roi_pool semantics reproduced exactly: start/end = round(coord
* scale) (half away from zero), roi size = end - start + 1 (legacy +1),
bin [floor(p*b), ceil((p+1)*b)) clamped to the feature extent, empty -> 0.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_NEG = -1e30


def _max_roi(box_extent: int, scale: float) -> int:
    """Largest possible rounded roi size (+1) for a fixed box extent."""
    # round(x + e) - round(x) for e = box_extent*scale is at most ceil(e),
    # plus the legacy +1.
    return int(math.ceil(box_extent * scale)) + 1


def _max_bin_width(out_n: int, win_n: int) -> int:
    """Static bound on ceil((p+1)*roi/out) - floor(p*roi/out) over all
    feasible roi sizes (out <= roi <= win) and bins p."""
    width = 1
    for roi in range(out_n, win_n + 1):
        for p in range(out_n):
            w = -((-(p + 1) * roi) // out_n) - (p * roi) // out_n
            width = max(width, w)
    return width


def _possible_rois(box_extent: int, scale: float) -> Tuple[int, ...]:
    """All roi sizes round(x2*s)-round(x1*s)+1 can take for integer box
    coordinates with fixed extent.  Fixed-size boxes yield at most two."""
    vals = set()
    denom = 1024  # box coords are integers; sample a full period
    for x1 in range(denom):
        rs = math.floor(x1 * scale + 0.5)
        re = math.floor((x1 + box_extent) * scale + 0.5)
        vals.add(max(re - rs + 1, 1))
    return tuple(sorted(vals))


def roi_max_pool(feature: jnp.ndarray,
                 boxes: jnp.ndarray,
                 scale: float,
                 out_size: Tuple[int, int],
                 box_size: Tuple[int, int]) -> jnp.ndarray:
    """RoI max pool of K fixed-size boxes from one feature map.

    Args:
      feature: (H, W, C) feature map.
      boxes: (K, 4) [x1, y1, x2, y2] in input-image pixels.
      scale: feature stride reciprocal (e.g. 1/32).
      out_size: (out_h, out_w) pooled output size.
      box_size: static (box_h, box_w) in input pixels (x2-x1 = box_w).
    Returns:
      (K, out_h, out_w, C) pooled features.
    """
    H, W, C = feature.shape
    out_h, out_w = out_size
    win_h = _max_roi(box_size[0], scale)
    win_w = _max_roi(box_size[1], scale)
    roi_cases_h = _possible_rois(box_size[0], scale)
    roi_cases_w = _possible_rois(box_size[1], scale)

    padded = jnp.pad(feature, ((0, win_h), (0, win_w), (0, 0)),
                     constant_values=_NEG)

    def pool_one(box):
        x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
        # std::round = half away from zero (coords are non-negative here);
        # jnp.round would round half to even.
        r = lambda v: jnp.floor(v * scale + 0.5).astype(jnp.int32)
        rs_w, rs_h, re_w, re_h = r(x1), r(y1), r(x2), r(y2)
        roi_w = jnp.maximum(re_w - rs_w + 1, 1)
        roi_h = jnp.maximum(re_h - rs_h + 1, 1)

        rs_h_c = jnp.clip(rs_h, 0, H)
        rs_w_c = jnp.clip(rs_w, 0, W)
        win = jax.lax.dynamic_slice(
            padded, (rs_h_c, rs_w_c, 0), (win_h, win_w, C))

        def static_axis_max(arr, axis, roi_static, out_n, win_n):
            # Bin [floor(p*roi/out), ceil((p+1)*roi/out)) with a STATIC roi:
            # indices are compile-time constants, so XLA lowers the bin max
            # to slices instead of dynamic gathers (the dynamic-gather form
            # was ~100x slower on TPU).  Rows beyond the feature extent
            # carry _NEG from the padding and lose the max, reproducing
            # torchvision's clamp; boundaries use exact integer arithmetic
            # (torchvision's fp32 drifts by one row at exact-integer
            # boundaries depending on device division rounding).
            p = np.arange(out_n)
            a = np.clip((p * roi_static) // out_n, 0, win_n - 1)
            z = np.clip(-((-(p + 1) * roi_static) // out_n) - 1,
                         0, win_n - 1)
            z = np.maximum(z, a)
            width = int((z - a).max()) + 1
            out = jnp.take(arr, jnp.asarray(a), axis=axis)
            for t in range(1, width):
                idx = jnp.asarray(np.minimum(a + t, z))
                out = jnp.maximum(out, jnp.take(arr, idx, axis=axis))
            return out

        def axis_max_cases(arr, axis, roi, out_n, win_n, roi_cases):
            # Fixed-size boxes admit at most two roi sizes per axis
            # (rounding of the scaled start); compute each static variant
            # and select by the traced roi value.
            variants = [static_axis_max(arr, axis, r, out_n, win_n)
                        for r in roi_cases]
            out = variants[0]
            for r, v in zip(roi_cases[1:], variants[1:]):
                out = jnp.where(roi == r, v, out)
            return out

        rows = axis_max_cases(win, 0, roi_h, out_h, win_h, roi_cases_h)
        pooled = axis_max_cases(rows, 1, roi_w, out_w, win_w, roi_cases_w)
        # Regions that fell entirely outside the feature yield 0
        # (torchvision empty-bin convention).
        return jnp.where(pooled < _NEG * 0.5, 0.0, pooled)

    return jax.vmap(pool_one)(boxes.astype(jnp.float32))


def roi_pool_pyramid(latent: jnp.ndarray,
                     skips: Sequence[jnp.ndarray],
                     boxes: jnp.ndarray,
                     patch_size: Tuple[int, int]
                     ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """Pool the latent and every skip scale for all boxes
    (RCNet/networks.py:404-433).

    skips are ordered shallow->deep with strides 2, 4, ..; the latent has
    stride 2^(len(skips)+1) (32 for the reference's 5-stage encoder) and
    pooled size patch // stride.
    """
    ph, pw = patch_size
    pooled_skips = []
    for i, skip in enumerate(skips):
        s = 1.0 / (2 ** (i + 1))
        out = (int(ph * s), int(pw * s))
        pooled_skips.append(roi_max_pool(skip, boxes, s, out, patch_size))
    lat_stride = 2 ** (len(skips) + 1)
    latent_out = (ph // lat_stride, pw // lat_stride)
    pooled_latent = roi_max_pool(latent, boxes, 1.0 / lat_stride, latent_out,
                                 patch_size)
    return pooled_latent, pooled_skips


def compose_patches(responses: jnp.ndarray,
                    points: jnp.ndarray,
                    point_mask: jnp.ndarray,
                    image_shape: Tuple[int, int],
                    patch_size: Tuple[int, int],
                    response_threshold: jnp.ndarray | float
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Composite per-point response crops into quasi-dense depth
    (rcnet_main.py:435-487).

    Args:
      responses: (K, ph, pw) sigmoid responses for each radar point's patch.
      points: (K, 3) (u, v, z) in PADDED image coordinates (u, v are the
        patch centres, already shifted by patch//2 as in run_rcnet:223-232).
      point_mask: (K,) validity of each (padded-bucket) point.
      image_shape: unpadded (H, W).
      patch_size: (ph, pw).
      response_threshold: responses below are zeroed before composition.
    Returns:
      (depth, response): two (H, W) maps; depth is the response-weighted
      average of contributing radar depths, response the max response.
    """
    H, W = image_shape
    ph, pw = patch_size
    pad_y, pad_x = ph // 2, pw // 2
    Hp, Wp = H + 2 * pad_y, W + 2 * pad_x

    thr = jnp.asarray(response_threshold, jnp.float32)
    resp = jnp.where(responses < thr, 0.0, responses)
    resp = resp * point_mask[:, None, None]

    def step(carry, inp):
        max_r, sum_r, sum_rz = carry
        crop, pt = inp
        u = jnp.round(pt[0]).astype(jnp.int32)
        v = jnp.round(pt[1]).astype(jnp.int32)
        z = pt[2]
        y0 = jnp.clip(v - pad_y, 0, Hp - ph)
        x0 = jnp.clip(u - pad_x, 0, Wp - pw)

        def upd(canvas, delta, combine):
            winv = jax.lax.dynamic_slice(canvas, (y0, x0), (ph, pw))
            return jax.lax.dynamic_update_slice(canvas, combine(winv, delta),
                                                (y0, x0))

        max_r = upd(max_r, crop, jnp.maximum)
        sum_r = upd(sum_r, crop, jnp.add)
        sum_rz = upd(sum_rz, crop * z, jnp.add)
        return (max_r, sum_r, sum_rz), None

    init = (jnp.zeros((Hp, Wp), jnp.float32),
            jnp.zeros((Hp, Wp), jnp.float32),
            jnp.zeros((Hp, Wp), jnp.float32))
    (max_r, sum_r, sum_rz), _ = jax.lax.scan(step, init, (resp, points))

    # Crop the padding off (rcnet_main.py:466).
    max_r = max_r[pad_y:pad_y + H, pad_x:pad_x + W]
    sum_r = sum_r[pad_y:pad_y + H, pad_x:pad_x + W]
    sum_rz = sum_rz[pad_y:pad_y + H, pad_x:pad_x + W]

    depth = jnp.where(max_r > 0, sum_rz / jnp.where(sum_r > 0, sum_r, 1.0),
                      0.0)
    return depth, max_r


def roi_pool_pyramid_batched(latent: jnp.ndarray,
                             skips: Sequence[jnp.ndarray],
                             boxes: jnp.ndarray,
                             patch_size: Tuple[int, int],
                             use_pallas: bool | None = None,
                             skip1_true_hw: Tuple[int, int] | None = None,
                             differentiable: bool = False,
                             skip1_folded_channels: int | None = None
                             ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """Batched multi-scale RoI pooling over (B, K) boxes.

    On TPU this dispatches to the Pallas double-buffered window-DMA kernel
    (ops/pallas/roi_pool.py, ~8x the vmapped dynamic-slice formulation);
    elsewhere it vmaps the XLA version.  Results are identical.
    ``differentiable=True`` selects the custom-VJP variant (Pallas
    scatter-to-argmax backward) so training steps keep the fast kernel.

    `skip1_true_hw=(H, W)` marks skips[0] as a pre-padded _NEG canvas from
    the fused stem kernel (ops/pallas/stem.py pad_to): the Pallas path
    consumes it via a free reshape; the XLA path slices it back.
    `skip1_folded_channels=C` marks it as the stem kernel's W-FOLDED
    canvas (fold_w: lane (w%4)*C + c) - bf16 TPU inference only - which
    the folded pool kernel consumes with no flatten relayout.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    if use_pallas:
        from riders_tpu.ops.pallas.roi_pool import (
            roi_pool_pyramid_pallas, roi_pool_pyramid_pallas_diff)
        if differentiable:
            assert skip1_folded_channels is None, (
                "the differentiable pool consumes the standard canvas")
            return roi_pool_pyramid_pallas_diff(
                latent, skips, boxes, patch_size,
                skip1_true_hw=skip1_true_hw)
        # (The 4D-native hybrid, roi_pool_pyramid_pallas4d, measured
        # NEUTRAL on the ZJU bench - 406.2 flat vs 406.5 hybrid, same
        # session - and is experiment-only now; call it directly to A/B.)
        return roi_pool_pyramid_pallas(latent, skips, boxes, patch_size,
                                       skip1_true_hw=skip1_true_hw,
                                       skip1_folded_channels=
                                       skip1_folded_channels)
    if skip1_folded_channels is not None:
        # unfold for the XLA path (shape fallback only; the fold path is
        # TPU-inference-only by construction)
        s1 = skips[0]
        B, R, Wq, CL = s1.shape
        s1 = s1.reshape(B, R, Wq, 4, CL // 4).reshape(B, R, Wq * 4,
                                                      CL // 4)
        skips = [s1] + list(skips[1:])
    if skip1_true_hw is not None:
        h1, w1 = skip1_true_hw
        skips = [skips[0][:, :h1, :w1]] + list(skips[1:])
    return jax.vmap(
        lambda lat, sks, bxs: roi_pool_pyramid(lat, sks, bxs, patch_size))(
            latent, skips, boxes)


def compose_patches_batched(responses: jnp.ndarray,
                            points: jnp.ndarray,
                            point_mask: jnp.ndarray,
                            image_shape: Tuple[int, int],
                            patch_size: Tuple[int, int],
                            response_threshold: jnp.ndarray | float,
                            use_pallas: bool | None = None
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched composition over (B, K, ph, pw) responses.

    On TPU this dispatches to the Pallas VMEM kernel
    (ops/pallas/compose.py, >100x the scan formulation); elsewhere it vmaps
    the XLA scan version.  Both produce bit-identical results.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    if use_pallas:
        from riders_tpu.ops.pallas.compose import compose_patches_pallas
        return compose_patches_pallas(
            responses, points, point_mask, image_shape, patch_size,
            response_threshold)
    if jnp.ndim(response_threshold) > 0:
        return jax.vmap(
            lambda r, p, m, t: compose_patches(
                r, p, m, image_shape, patch_size, t))(
                    responses, points, point_mask,
                    jnp.asarray(response_threshold))
    return jax.vmap(
        lambda r, p, m: compose_patches(
            r, p, m, image_shape, patch_size, response_threshold))(
                responses, points, point_mask)


def adaptive_threshold_value(responses: jnp.ndarray,
                             point_mask: jnp.ndarray,
                             response_threshold: float,
                             threshold_decay: float = 0.05,
                             max_retries: int = 8) -> jnp.ndarray:
    """Closed form of the adaptive threshold-decay retry
    (run_rcnet_zju.py:254-264) - no loop needed on device.

    The retry loop lowers the threshold by `threshold_decay` while the
    composed depth is all zero; the depth is all zero iff no masked
    response reaches the threshold, so the final threshold is
    thr0 - k*decay with k = ceil((thr0 - max_response)/decay) clamped to
    [0, max_retries].  One composition at this threshold reproduces the
    loop's output exactly (bounded-retry semantics included: if even
    max_retries decays cannot reach max_response, the output stays zero).

    responses: (.., K, ph, pw); point_mask: (.., K).  Returns a scalar (or
    batch vector) threshold usable with `compose_patches_batched`.
    """
    masked = responses * point_mask[..., None, None]
    m = jnp.max(masked, axis=(-3, -2, -1))
    k = jnp.ceil((response_threshold - m) / threshold_decay)
    k = jnp.clip(k, 0, max_retries)
    return jnp.float32(response_threshold) - k.astype(jnp.float32) \
        * threshold_decay


def adaptive_compose(responses: jnp.ndarray,
                     points: jnp.ndarray,
                     point_mask: jnp.ndarray,
                     image_shape: Tuple[int, int],
                     patch_size: Tuple[int, int],
                     response_threshold: float,
                     threshold_decay: float = 0.05,
                     max_retries: int = 8
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Composition with the adaptive threshold-decay retry of
    run_rcnet_zju.py:254-264: while the composed depth is all zero, lower
    the threshold by `threshold_decay` (bounded retries keep the loop
    shape-static).

    Returns (depth, response, final_threshold).
    """

    def cond(state):
        depth, _, thr, it = state
        return jnp.logical_and(jnp.sum(depth) == 0.0, it < max_retries)

    def body(state):
        _, _, thr, it = state
        depth, resp = compose_patches(
            responses, points, point_mask, image_shape, patch_size, thr)
        return depth, resp, thr - threshold_decay, it + 1

    depth0, resp0 = compose_patches(
        responses, points, point_mask, image_shape, patch_size,
        response_threshold)
    depth, resp, thr, _ = jax.lax.while_loop(
        cond, body,
        (depth0, resp0, jnp.float32(response_threshold - threshold_decay),
         jnp.int32(0)))
    return depth, resp, thr + threshold_decay
