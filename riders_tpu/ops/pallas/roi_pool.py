"""Pallas TPU kernel for fixed-size RoI max pooling.

The XLA formulation (ops/patches.py roi_max_pool) crops one window per
radar point with vmapped dynamic_slice; XLA lowers the 512-point batch to a
sequential while loop of HBM round-trips (~4 ms per scale per batch-8 call
at 640x512).  This kernel streams the windows through VMEM instead:

  grid = (B,); per frame a double-buffered loop over the K points - the
  next window's HBM->VMEM DMA is in flight while the current window's bin
  max computes.

Mosaic tiling constraints shape the layout: DMA slice offsets/extents on
the tiled (last two) dims must be (8,128)-aligned, and C < 128 channels
can't satisfy that alone - so the (W, C) dims are flattened to one W*C
lane dim.  Windows then live at lane offset rs_w*C: aligning rs_w down to
`128/gcd(C,128)` makes the offset provably 128-aligned, and the small
residual is rotated out with a dynamic lane roll.  Bin maxes use only
static contiguous slices (uniform-bin scales) or per-bin slices (the tiny
irregular scales); Mosaic kernels cannot capture constant index arrays.

Semantics identical to ops/patches.py:roi_max_pool - torchvision roi_pool
with exact integer bin boundaries, _NEG padding reproducing the border
clamp, empty bins yielding 0.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from riders_tpu.ops.patches import _max_roi, _possible_rois

_NEG = -1e30


def _bin_plan(roi_static: int, out_n: int, win_n: int):
    """Static bin starts/widths with exact integer boundaries."""
    p = np.arange(out_n)
    a = np.clip((p * roi_static) // out_n, 0, win_n - 1)
    z = np.clip(-((-(p + 1) * roi_static) // out_n) - 1, 0, win_n - 1)
    z = np.maximum(z, a)
    return a, z - a + 1


def _h_bin_max(win: jnp.ndarray, roi_static: int, out_n: int,
               row_offset: int = 0, axis: int = 0) -> jnp.ndarray:
    """Bin max along `axis` with static slices only; `row_offset` shifts
    all bins by the DMA alignment residue."""
    a, widths = _bin_plan(roi_static, out_n, win.shape[axis] - row_offset)
    a = a + row_offset
    offs = a - np.arange(out_n)
    if (offs == offs[0]).all() and (widths == widths[0]).all():
        j = int(offs[0])
        out = jax.lax.slice_in_dim(win, j, j + out_n, axis=axis)
        for t in range(1, int(widths[0])):
            out = jnp.maximum(out, jax.lax.slice_in_dim(
                win, j + t, j + t + out_n, axis=axis))
        return out
    outs = []
    for pi in range(out_n):
        acc = jax.lax.slice_in_dim(win, int(a[pi]), int(a[pi]) + 1,
                                   axis=axis)
        for t in range(1, int(widths[pi])):
            acc = jnp.maximum(acc, jax.lax.slice_in_dim(
                win, int(a[pi]) + t, int(a[pi]) + t + 1, axis=axis))
        outs.append(acc)
    return jnp.concatenate(outs, axis=axis)


def _w_bin_max_flat(rows: jnp.ndarray, roi_static: int, out_n: int,
                    win_w: int, C: int, col_offset: int = 0) -> jnp.ndarray:
    """Bin max along the flattened (W*C) lane axis: element block p covers
    lanes [a_p*C, (a_p+1)*C); `col_offset` shifts bins by the DMA
    alignment residue (in W units)."""
    a, widths = _bin_plan(roi_static, out_n, win_w - col_offset)
    a = a + col_offset
    offs = a - np.arange(out_n)
    if (offs == offs[0]).all() and (widths == widths[0]).all():
        j = int(offs[0])
        out = jax.lax.slice_in_dim(rows, j * C, (j + out_n) * C, axis=1)
        for t in range(1, int(widths[0])):
            out = jnp.maximum(out, jax.lax.slice_in_dim(
                rows, (j + t) * C, (j + t + out_n) * C, axis=1))
        return out
    outs = []
    for pi in range(out_n):
        acc = jax.lax.slice_in_dim(rows, int(a[pi]) * C,
                                   (int(a[pi]) + 1) * C, axis=1)
        for t in range(1, int(widths[pi])):
            acc = jnp.maximum(acc, jax.lax.slice_in_dim(
                rows, (int(a[pi]) + t) * C, (int(a[pi]) + t + 1) * C,
                axis=1))
        outs.append(acc)
    return jnp.concatenate(outs, axis=1)


def roi_window_pad(box_size: Tuple[int, int], scale: float,
                   channels: int) -> Tuple[int, int]:
    """(win_h, win_w) padding the pool kernels need beyond the feature
    extent (8-aligned row window; win_w aligned for BOTH kernel window
    geometries: the flat kernel's lane-128 (W*C) offsets and the 4D
    kernel's sublane-8 W offsets).  A producer that writes its output
    into a (H + win_h, W + win_w) _NEG-filled canvas lets
    `roi_max_pool_pallas*(..., true_hw=...)` consume it with zero
    slice/pad/relayout passes."""
    win_h = -(-(_max_roi(box_size[0], scale) + 8) // 8) * 8
    align = 128 // math.gcd(channels, 128)
    step = align * 8 // math.gcd(align, 8)  # lcm(align, 8)
    win_w = -(-(_max_roi(box_size[1], scale) + step) // step) * step
    return win_h, win_w


def _box_params(boxes: jnp.ndarray, scale: float, H: int, W: int,
                align: int):
    """Shared box->window arithmetic for the forward and backward kernels:
    torchvision rounding (half away from zero), clamps, and the DMA
    alignment split rs = div * alignment + residue."""
    b32 = boxes.astype(jnp.float32)
    r = lambda v: jnp.floor(v * scale + 0.5).astype(jnp.int32)
    rs_w, rs_h = r(b32[..., 0]), r(b32[..., 1])
    roi_w = jnp.maximum(r(b32[..., 2]) - rs_w + 1, 1)
    roi_h = jnp.maximum(r(b32[..., 3]) - rs_h + 1, 1)
    rs_h = jnp.clip(rs_h, 0, H)
    rs_w = jnp.clip(rs_w, 0, W)
    rs_w_div = rs_w // align
    resid_w = rs_w - rs_w_div * align     # in W units; lane roll is *C
    rs_h_div = rs_h // 8
    resid_h = rs_h - rs_h_div * 8
    return rs_h_div, resid_h, rs_w_div, resid_w, roi_h, roi_w


def roi_max_pool_pallas(feature: jnp.ndarray,
                        boxes: jnp.ndarray,
                        scale: float,
                        out_size: Tuple[int, int],
                        box_size: Tuple[int, int],
                        interpret: bool = False,
                        true_hw: Tuple[int, int] | None = None
                        ) -> jnp.ndarray:
    """Batched RoI max pool, identical semantics to ops/patches.py
    roi_max_pool vmapped over (B, K).

    feature: (B, H, W, C); boxes: (B, K, 4) [x1, y1, x2, y2].
    When `true_hw=(H, W)` is given, `feature` is already a _NEG-padded
    canvas of shape (B, rows >= H + win_h, W + win_w, C) (see
    roi_window_pad) and is consumed via a free reshape.
    Returns (B, K, out_h, out_w, C) in the feature dtype.
    """
    B, C = feature.shape[0], feature.shape[-1]
    H, W = true_hw if true_hw is not None else feature.shape[1:3]
    K = boxes.shape[1]
    out_h, out_w = out_size
    win_h, win_w = roi_window_pad(box_size, scale, C)
    lane_w = win_w * C
    roi_cases_h = _possible_rois(box_size[0], scale)
    roi_cases_w = _possible_rois(box_size[1], scale)
    align = 128 // math.gcd(C, 128)

    if true_hw is not None:
        assert feature.shape[2] >= W + win_w, (feature.shape, W, win_w)
        assert feature.shape[1] >= H + win_h, (feature.shape, H, win_h)
        flat = feature.reshape(B, feature.shape[1],
                               feature.shape[2] * C)
    else:
        padded = jnp.pad(feature,
                         ((0, 0), (0, win_h), (0, win_w), (0, 0)),
                         constant_values=jnp.asarray(_NEG, feature.dtype))
        flat = padded.reshape(B, H + win_h, (W + win_w) * C)

    (rs_h_div, resid_h, rs_w_div, resid_w, roi_h, roi_w) = _box_params(
        boxes, scale, H, W, align)

    # Chunk the K axis so the (double-buffered) output block fits VMEM.
    bytes_per_point = out_h * out_w * C * feature.dtype.itemsize
    kc = K
    while kc > 1 and kc * bytes_per_point > 2 * 1024 * 1024:
        kc //= 2
    while K % kc != 0:
        kc -= 1
    n_chunks = K // kc

    def kernel(rshd_ref, residh_ref, rswd_ref, residw_ref, roih_ref,
               roiw_ref, feat_ref, out_ref, win_scratch, sems):
        b = pl.program_id(0)
        c0 = pl.program_id(1) * kc
        # Window slots alternate on the GLOBAL window index so the
        # prefetch chain crosses program boundaries: each program's
        # first window is already in flight when it starts (the
        # per-program cold start cost ~10 us x B x n_chunks).
        step = b * n_chunks + pl.program_id(1)
        g0 = step * kc

        def get_dma(slot, b_, k_):
            return pltpu.make_async_copy(
                feat_ref.at[b_,
                            pl.ds(rshd_ref[b_, k_] * 8, win_h),
                            pl.ds(rswd_ref[b_, k_] * (align * C), lane_w)],
                win_scratch.at[slot],
                sems.at[slot])

        @pl.when(step == 0)
        def _():
            get_dma(0, b, c0).start()

        def body(j, _):
            k = c0 + j
            slot = jax.lax.rem(g0 + j, 2)

            nxt = g0 + j + 1

            @pl.when(nxt < B * n_chunks * kc)
            def _():
                step2 = nxt // kc
                get_dma(jax.lax.rem(nxt, 2), step2 // n_chunks,
                        jax.lax.rem(step2, n_chunks) * kc
                        + jax.lax.rem(nxt, kc)).start()

            get_dma(slot, b, k).wait()
            # Rotate out the alignment residues (dynamic rotate handles
            # 32-bit lanes only, hence the f32 cast; shifts must be
            # non-negative).
            win = win_scratch[slot].astype(jnp.float32)
            win = pltpu.roll(win, win_h - residh_ref[b, k], 0)
            win = pltpu.roll(win, lane_w - residw_ref[b, k] * C, 1)

            def h_cases(arr):
                variants = [_h_bin_max(arr, rc, out_h)
                            for rc in roi_cases_h]
                out = variants[0]
                for rc, v in zip(roi_cases_h[1:], variants[1:]):
                    out = jnp.where(roih_ref[b, k] == rc, v, out)
                return out

            def w_cases(arr):
                variants = [_w_bin_max_flat(arr, rc, out_w, win_w, C)
                            for rc in roi_cases_w]
                out = variants[0]
                for rc, v in zip(roi_cases_w[1:], variants[1:]):
                    out = jnp.where(roiw_ref[b, k] == rc, v, out)
                return out

            pooled = w_cases(h_cases(win))
            pooled = jnp.where(pooled < _NEG * 0.5,
                               jnp.asarray(0.0, pooled.dtype), pooled)
            out_ref[0, j] = pooled.astype(out_ref.dtype)
            return 0

        jax.lax.fori_loop(0, kc, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec(flat.shape, lambda b, c, *_: (0, 0, 0),
                         memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, kc, out_h, out_w * C),
                               lambda b, c, *_: (b, c, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, win_h, lane_w), feature.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, K, out_h, out_w * C),
                                       feature.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(rs_h_div, resid_h, rs_w_div, resid_w, roi_h, roi_w, flat)
    return out.reshape(B, K, out_h, out_w, C)


def roi_pool_pyramid_pallas(latent: jnp.ndarray,
                            skips: Sequence[jnp.ndarray],
                            boxes: jnp.ndarray,
                            patch_size: Tuple[int, int],
                            interpret: bool = False,
                            skip1_true_hw: Tuple[int, int] | None = None,
                            skip1_folded_channels: int | None = None
                            ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """Batched multi-scale pooling (RCNet/networks.py:404-433): latent at
    1/2^(len(skips)+1) (1/32 in the reference topology) plus skips at
    strides 2..  `skip1_true_hw` marks skips[0] as an already-_NEG-padded
    canvas (see roi_window_pad); with `skip1_folded_channels=C` it is the
    W-FOLDED canvas from the stem kernel's fold_w path (lane
    (w%4)*C + c), consumed by `roi_max_pool_pallas_foldw` with no
    flatten relayout."""
    ph, pw = patch_size
    pooled_skips = []
    for i, skip in enumerate(skips):
        s = 1.0 / (2 ** (i + 1))
        out = (int(ph * s), int(pw * s))
        if i == 0 and skip1_folded_channels is not None:
            assert skip1_true_hw is not None
            pooled = roi_max_pool_pallas_foldw(
                skip, boxes, s, out, patch_size, true_hw=skip1_true_hw,
                channels=skip1_folded_channels, interpret=interpret)
            pooled_skips.append(
                unfold_pooled(pooled, out[1], skip1_folded_channels))
            continue
        hw = skip1_true_hw if i == 0 else None
        pooled_skips.append(
            roi_max_pool_pallas(skip, boxes, s, out, patch_size, interpret,
                                true_hw=hw))
    lat_stride = 2 ** (len(skips) + 1)
    latent_out = (ph // lat_stride, pw // lat_stride)
    pooled_latent = roi_max_pool_pallas(latent, boxes, 1.0 / lat_stride,
                                        latent_out, patch_size, interpret)
    return pooled_latent, pooled_skips


def roi_window_pad_folded(box_size: Tuple[int, int], scale: float,
                          channels: int) -> Tuple[int, int]:
    """(win_h, win_w) canvas padding (in unfolded units) for the W-FOLDED
    pool kernel (`roi_max_pool_pallas_foldw`): the W window is DMA'd at
    32-column (8-sublane x fold-4) alignment, so it must cover the 31-
    column worst-case residue plus the roi, rounded to whole 8-sublane
    groups.  Maxed against `roi_window_pad` so one canvas geometry also
    satisfies the flat kernel (the training path's differentiable pool
    consumes a standard canvas with the same padding)."""
    win_h_flat, win_w_flat = roi_window_pad(box_size, scale, channels)
    win_wq = -(-(31 + _max_roi(box_size[1], scale)) // 4)
    win_wq = -(-win_wq // 8) * 8
    return win_h_flat, max(4 * win_wq, win_w_flat)


def roi_max_pool_pallas_foldw(canvas: jnp.ndarray,
                              boxes: jnp.ndarray,
                              scale: float,
                              out_size: Tuple[int, int],
                              box_size: Tuple[int, int],
                              true_hw: Tuple[int, int],
                              channels: int = 32,
                              interpret: bool = False) -> jnp.ndarray:
    """RoI max pool consuming a W-FOLDED _NEG canvas (the fold_w output
    of ops/pallas/stem.stem_conv_pallas): canvas (B, R, Wq, 4*C) with
    lane (w%4)*C + c holding column w = 4q + (lane//C) of the true
    (H, W) feature.  Same torchvision semantics as `roi_max_pool_pallas`.

    Folding removes the canvas->flat relayout copies on the input side
    (2.5 ms/call at the ZJU geometry, PERF.md round 4): the window DMA
    slices untiled rows exactly, 8-aligned sublane W-groups, and full
    128-lane tiles; the 31-column worst-case residue cancels with one
    dynamic sublane roll plus one dynamic lane roll (+ carry select).
    W bins are evaluated IN folded space: tap shift maps s = a_p - p + t
    are computed elementwise from a lane/sublane iota against the traced
    roi width, selecting among smax+1 statically rolled window variants.

    Returns (B, K, out_h, OQ, 4*C) with OQ = ceil(out_w/4): pooled
    column p = 4*oq + (lane//C) - the same folded lane order as the
    canvas.  The consumer unfolds with one reshape+slice (whose relayout
    replaces - at equal cost - the pooled-output copies the flat kernel
    needs anyway).
    """
    B, R, Wq2c, CL = canvas.shape
    C = channels
    F = CL // C
    assert F == 4 and CL == 128, (canvas.shape, channels)
    H, W = true_hw
    K = boxes.shape[1]
    out_h, out_w = out_size
    OQ = -(-out_w // 4)
    ext_h = max(_possible_rois(box_size[0], scale))
    win_wq = -(-(31 + _max_roi(box_size[1], scale)) // 4)
    win_wq = -(-win_wq // 8) * 8
    assert R >= H + ext_h, (R, H, ext_h)
    # worst-case DMA window: wq offset (W//32)*8 + win_wq sublanes
    assert Wq2c >= (W // 32) * 8 + win_wq, (Wq2c, W, win_wq)
    roi_cases_h = _possible_rois(box_size[0], scale)
    roi_cases_w = _possible_rois(box_size[1], scale)
    # max forward tap shift s = a_p - p + width - 1 over all cases
    smax = 0
    for rw in roi_cases_w:
        a, widths = _bin_plan(rw, out_w, win_wq * 4)
        smax = max(smax, int((a + widths - 1 - np.arange(out_w)).max()))
    assert smax <= 7, smax

    b32 = boxes.astype(jnp.float32)
    rr = lambda v: jnp.floor(v * scale + 0.5).astype(jnp.int32)
    rs_w, rs_h = rr(b32[..., 0]), rr(b32[..., 1])
    roi_w = jnp.maximum(rr(b32[..., 2]) - rs_w + 1, 1)
    roi_h = jnp.maximum(rr(b32[..., 3]) - rs_h + 1, 1)
    rs_h = jnp.clip(rs_h, 0, H)
    rs_w = jnp.clip(rs_w, 0, W)
    wq_div = rs_w // 32          # DMA offset in 8-sublane units
    resid = rs_w - 32 * wq_div   # [0, 32) columns

    bytes_per_point = out_h * OQ * CL * canvas.dtype.itemsize
    kc = K
    while kc > 1 and kc * bytes_per_point > 2 * 1024 * 1024:
        kc //= 2
    while K % kc != 0:
        kc -= 1
    n_chunks = K // kc

    def kernel(rsh_ref, wqd_ref, resid_ref, roih_ref, roiw_ref,
               canvas_ref, out_ref, win_scratch, sems):
        b = pl.program_id(0)
        c0 = pl.program_id(1) * kc
        step = b * n_chunks + pl.program_id(1)
        g0 = step * kc

        def get_dma(slot, b_, k_):
            return pltpu.make_async_copy(
                canvas_ref.at[b_,
                              pl.ds(rsh_ref[b_, k_], ext_h),
                              pl.ds(wqd_ref[b_, k_] * 8, win_wq)],
                win_scratch.at[slot],
                sems.at[slot])

        @pl.when(step == 0)
        def _():
            get_dma(0, b, c0).start()

        lane_a = jax.lax.broadcasted_iota(
            jnp.int32, (ext_h, win_wq, CL), 2) // C
        oa_i = jax.lax.broadcasted_iota(jnp.int32, (out_h, OQ, CL), 2) // C
        oq_i = jax.lax.broadcasted_iota(jnp.int32, (out_h, OQ, CL), 1)
        p_i = 4 * oq_i + oa_i

        def body(j, _):
            k = c0 + j
            slot = jax.lax.rem(g0 + j, 2)
            nxt = g0 + j + 1

            @pl.when(nxt < B * n_chunks * kc)
            def _():
                step2 = nxt // kc
                get_dma(jax.lax.rem(nxt, 2), step2 // n_chunks,
                        jax.lax.rem(step2, n_chunks) * kc
                        + jax.lax.rem(nxt, kc)).start()

            get_dma(slot, b, k).wait()
            win = win_scratch[slot].astype(jnp.float32)
            # cancel the residue: w_aligned[i] = canvas[resid + i]
            rq = resid_ref[b, k] // 4
            ra = resid_ref[b, k] - 4 * rq
            win = pltpu.roll(win, win_wq - rq, 1)
            lrolled = pltpu.roll(win, CL - ra * C, 2)
            lroll_up = pltpu.roll(lrolled, win_wq - 1, 1)
            win = jnp.where(lane_a >= 4 - ra, lroll_up, lrolled)

            # H bins first (rows untiled, static slices per roi case).
            def h_cases(arr):
                variants = [_h_bin_max(arr, rc, out_h)
                            for rc in roi_cases_h]
                out = variants[0]
                for rc, v in zip(roi_cases_h[1:], variants[1:]):
                    out = jnp.where(roih_ref[b, k] == rc, v, out)
                return out

            hb = h_cases(win)                      # (out_h, win_wq, CL)

            # W bins in folded space: variant V_s[p] = hb[w = p + s].
            variants = []
            for s in range(smax + 1):
                sm, sd = s % 4, s // 4
                ls = hb if sm == 0 else pltpu.roll(hb, CL - sm * C, 2)
                l0 = ls if sd == 0 else pltpu.roll(ls, win_wq - sd, 1)
                if sm == 0:
                    v = l0
                else:
                    l1 = pltpu.roll(ls, win_wq - sd - 1, 1)
                    v = jnp.where(
                        jax.lax.broadcasted_iota(
                            jnp.int32, l0.shape, 2) // C >= 4 - sm,
                        l1, l0)
                variants.append(v[:, :OQ])
            rw = roiw_ref[b, k]
            s1 = (p_i * rw) // out_w - p_i
            s2 = ((p_i + 1) * rw - 1) // out_w - p_i
            neg = jnp.float32(_NEG)
            pooled = jnp.full((out_h, OQ, CL), neg, jnp.float32)
            for s in range(smax + 1):
                pooled = jnp.maximum(
                    pooled, jnp.where((s1 <= s) & (s <= s2),
                                      variants[s], neg))
            pooled = jnp.where(pooled < _NEG * 0.5, 0.0, pooled)
            out_ref[0, j] = pooled.astype(out_ref.dtype)
            return 0

        jax.lax.fori_loop(0, kc, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec(canvas.shape, lambda b, c, *_: (0, 0, 0, 0),
                         memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, kc, out_h, OQ, CL),
                               lambda b, c, *_: (b, c, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, ext_h, win_wq, CL), canvas.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, K, out_h, OQ, CL),
                                       canvas.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(rs_h, wq_div, resid, roi_h, roi_w, canvas)
    return out


def unfold_pooled(pooled: jnp.ndarray, out_w: int, channels: int
                  ) -> jnp.ndarray:
    """(B, K, out_h, OQ, 4*C) folded pool output -> (B, K, out_h, out_w,
    C) standard layout.

    The folded lane order (w%4)*C + c IS the flat w*C + c order within
    each 128-lane group, so flattening the last two dims is a free
    bitcast and the whole unfold is ONE offset-0 lane slice (the
    reshape-then-w-slice form cost an extra permute copy + a mid-tensor
    slice, 2.0 ms/call at the ZJU geometry - trace, round 4)."""
    B, K, out_h, OQ, CL = pooled.shape
    C = channels
    x = pooled.reshape(B, K, out_h, OQ * CL)[..., :out_w * C]
    return x.reshape(B, K, out_h, out_w, C)


# ---------------------------------------------------------------------------
# 4D-native variant: consumes the (B, H, W, C) feature (or the stem's
# _NEG-padded canvas) DIRECTLY and emits (B*K, out_h, out_w, C) in the
# standard conv layout.  In a rank>=3 block only the LAST TWO dims are
# tiled, so the window DMA's row offsets live on an untiled dim (exact,
# no 8-alignment, no residue roll) and the W offsets 8-align with a
# single dynamic sublane roll - the flat kernel's f32 lane roll
# disappears.  This removes the canvas->flat relayout copies and the
# skip pad+flatten chains on the pool's input side (~3 ms/call at the
# ZJU geometry, PERF.md round 3) at the price of lane-padded window
# DMAs for C < 128 (4x bytes at C=32).
# ---------------------------------------------------------------------------


def roi_max_pool_pallas4d(feature: jnp.ndarray,
                          boxes: jnp.ndarray,
                          scale: float,
                          out_size: Tuple[int, int],
                          box_size: Tuple[int, int],
                          interpret: bool = False,
                          true_hw: Tuple[int, int] | None = None
                          ) -> jnp.ndarray:
    """Batched RoI max pool over the 4D feature, identical semantics to
    `roi_max_pool_pallas` (torchvision roi_pool, RCNet/networks.py:418-433).

    EXPERIMENT-ONLY (no production caller): the hybrid router
    `roi_pool_pyramid_pallas4d` measured NEUTRAL vs the flat kernel on
    the ZJU bench and is no longer reachable from `roi_pool_pyramid_batched`
    (PERF.md round 3).  In particular the `true_hw` canvas path below is
    exercised only by the interpret-mode parity test
    (tests/test_pallas_parity.py::test_roi_pool_4d_true_hw_canvas) — the
    router always sends canvas inputs to the flat kernel, so this branch
    has never compiled through Mosaic on chip; re-verify on hardware
    before wiring it up.

    feature: (B, H, W, C); boxes: (B, K, 4) [x1, y1, x2, y2].  With
    `true_hw=(H, W)`, `feature` is already a _NEG-padded canvas of shape
    (B, rows >= H + win_h, >= W + win_w, C) (see roi_window_pad) and is
    consumed with no data movement at all.
    Returns (B, K, out_h, out_w, C) in the feature dtype.
    """
    B, C = feature.shape[0], feature.shape[-1]
    H, W = true_hw if true_hw is not None else feature.shape[1:3]
    K = boxes.shape[1]
    out_h, out_w = out_size
    win_h, win_w = roi_window_pad(box_size, scale, C)
    roi_cases_h = _possible_rois(box_size[0], scale)
    roi_cases_w = _possible_rois(box_size[1], scale)
    ext_h = max(roi_cases_h)  # untiled row extent: exact, no alignment

    if true_hw is not None:
        assert feature.shape[2] >= W + win_w, (feature.shape, W, win_w)
        assert feature.shape[1] >= H + ext_h, (feature.shape, H, ext_h)
        canvas = feature
    else:
        canvas = jnp.pad(feature,
                         ((0, 0), (0, ext_h), (0, win_w), (0, 0)),
                         constant_values=jnp.asarray(_NEG, feature.dtype))

    (rs_h_div, resid_h, rs_w_div, resid_w, roi_h, roi_w) = _box_params(
        boxes, scale, H, W, 8)
    rs_h = rs_h_div * 8 + resid_h  # rows are untiled: exact offsets

    # Chunk K so the double-buffered PADDED output block fits VMEM.
    pad_w = -(-out_w // 8) * 8
    pad_c = -(-C // 128) * 128
    bytes_per_point = out_h * pad_w * pad_c * feature.dtype.itemsize
    kc = K
    while kc > 1 and kc * bytes_per_point > 2 * 1024 * 1024:
        kc //= 2
    while K % kc != 0:
        kc -= 1
    n_chunks = K // kc

    def kernel(rsh_ref, rswd_ref, residw_ref, roih_ref, roiw_ref,
               feat_ref, out_ref, win_scratch, sems):
        b = pl.program_id(0)
        c0 = pl.program_id(1) * kc
        step = b * n_chunks + pl.program_id(1)
        g0 = step * kc

        def get_dma(slot, b_, k_):
            return pltpu.make_async_copy(
                feat_ref.at[b_,
                            pl.ds(rsh_ref[b_, k_], ext_h),
                            pl.ds(rswd_ref[b_, k_] * 8, win_w), :],
                win_scratch.at[slot],
                sems.at[slot])

        @pl.when(step == 0)
        def _():
            get_dma(0, b, c0).start()

        def body(j, _):
            k = c0 + j
            slot = jax.lax.rem(g0 + j, 2)
            nxt = g0 + j + 1

            @pl.when(nxt < B * n_chunks * kc)
            def _():
                step2 = nxt // kc
                get_dma(jax.lax.rem(nxt, 2), step2 // n_chunks,
                        jax.lax.rem(step2, n_chunks) * kc
                        + jax.lax.rem(nxt, kc)).start()

            get_dma(slot, b, k).wait()
            # One sublane roll clears the W alignment residue (rows need
            # none); f32 for the dynamic rotate, as in the flat kernel.
            win = win_scratch[slot].astype(jnp.float32)
            win = pltpu.roll(win, win_w - residw_ref[b, k], 1)

            def h_cases(arr):
                variants = [_h_bin_max(arr, rc, out_h, axis=0)
                            for rc in roi_cases_h]
                out = variants[0]
                for rc, v in zip(roi_cases_h[1:], variants[1:]):
                    out = jnp.where(roih_ref[b, k] == rc, v, out)
                return out

            def w_cases(arr):
                variants = [_h_bin_max(arr, rc, out_w, axis=1)
                            for rc in roi_cases_w]
                out = variants[0]
                for rc, v in zip(roi_cases_w[1:], variants[1:]):
                    out = jnp.where(roiw_ref[b, k] == rc, v, out)
                return out

            pooled = w_cases(h_cases(win))
            pooled = jnp.where(pooled < _NEG * 0.5,
                               jnp.asarray(0.0, pooled.dtype), pooled)
            out_ref[j] = pooled.astype(out_ref.dtype)
            return 0

        jax.lax.fori_loop(0, kc, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec(canvas.shape, lambda b, c, *_: (0, 0, 0, 0),
                         memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((kc, out_h, out_w, C),
                               lambda b, c, *_: (b * n_chunks + c, 0, 0,
                                                 0)),
        scratch_shapes=[
            pltpu.VMEM((2, ext_h, win_w, C), feature.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B * K, out_h, out_w, C),
                                       feature.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(rs_h, rs_w_div, resid_w, roi_h, roi_w, canvas)
    return out.reshape(B, K, out_h, out_w, C)


def roi_pool_pyramid_pallas4d(latent: jnp.ndarray,
                              skips: Sequence[jnp.ndarray],
                              boxes: jnp.ndarray,
                              patch_size: Tuple[int, int],
                              interpret: bool = False,
                              skip1_true_hw: Tuple[int, int] | None = None
                              ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """`roi_pool_pyramid_pallas` routing each level through the 4D-native
    kernel where Mosaic's DMA rules allow it (inference fast path; the
    differentiable pyramid stays on the flat kernels).

    Mosaic requires manual-DMA lane slices to be 128-aligned even when
    they span the full channel dim, so the 4D kernel only serves levels
    with C % 128 == 0 (skip3/skip4/latent in the production topology);
    the C=32/64 shallow skips keep the flat (rows, W*C) kernel - which
    also keeps the stem's pre-padded flat canvas fast path intact."""
    ph, pw = patch_size

    def pool(feat, s, out, hw):
        if feat.shape[-1] % 128 == 0 and hw is None:
            return roi_max_pool_pallas4d(feat, boxes, s, out, patch_size,
                                         interpret)
        return roi_max_pool_pallas(feat, boxes, s, out, patch_size,
                                   interpret, true_hw=hw)

    pooled_skips = []
    for i, skip in enumerate(skips):
        s = 1.0 / (2 ** (i + 1))
        out = (int(ph * s), int(pw * s))
        hw = skip1_true_hw if i == 0 else None
        pooled_skips.append(pool(skip, s, out, hw))
    lat_stride = 2 ** (len(skips) + 1)
    pooled_latent = pool(latent, 1.0 / lat_stride,
                         (ph // lat_stride, pw // lat_stride), None)
    return pooled_latent, pooled_skips


# ---------------------------------------------------------------------------
# Differentiable variant: custom VJP with a Pallas backward (max-pool
# backward = route each bin's upstream gradient to the bin's argmax).
# torchvision's backward sends the gradient to the FIRST max when a bin
# holds exact-duplicate maxima; this kernel sends it to every tied element
# (equality routing).  Exact float ties inside a bin do not occur for real
# feature maps, and the repo's XLA formulation (lax.max select chains) is
# the parity reference (tests/test_pallas_parity.py gradient test).
# ---------------------------------------------------------------------------


def _roi_pool_bwd_pallas(feature: jnp.ndarray,
                         boxes: jnp.ndarray,
                         grad: jnp.ndarray,
                         scale: float,
                         out_size: Tuple[int, int],
                         box_size: Tuple[int, int],
                         interpret: bool = False,
                         true_hw: Tuple[int, int] | None = None
                         ) -> jnp.ndarray:
    """d(pooled)/d(feature)^T applied to `grad`.

    grad: (B, K, out_h, out_w, C) cotangent of the pooled output.
    Returns d(feature) with `feature`'s shape and dtype.

    Per (b, k) grid step: re-DMA the feature window, recompute the
    row/column bin maxima (cheap VPU work), route the bin gradients back
    to their arg-max positions with static-slice masks + rolls, and
    accumulate into the output canvas with a serialized read-modify-write
    window DMA (the sequential TPU grid makes overlapping windows safe).
    """
    B, C = feature.shape[0], feature.shape[-1]
    H, W = true_hw if true_hw is not None else feature.shape[1:3]
    K = boxes.shape[1]
    out_h, out_w = out_size
    win_h, win_w = roi_window_pad(box_size, scale, C)
    lane_w = win_w * C
    roi_cases_h = _possible_rois(box_size[0], scale)
    roi_cases_w = _possible_rois(box_size[1], scale)
    align = 128 // math.gcd(C, 128)

    if true_hw is not None:
        assert feature.shape[2] >= W + win_w, (feature.shape, W, win_w)
        assert feature.shape[1] >= H + win_h, (feature.shape, H, win_h)
        flat = feature.reshape(B, feature.shape[1], feature.shape[2] * C)
    else:
        padded = jnp.pad(feature,
                         ((0, 0), (0, win_h), (0, win_w), (0, 0)),
                         constant_values=jnp.asarray(_NEG, feature.dtype))
        flat = padded.reshape(B, H + win_h, (W + win_w) * C)

    (rs_h_div, resid_h, rs_w_div, resid_w, roi_h, roi_w) = _box_params(
        boxes, scale, H, W, align)

    grad_flat = grad.reshape(B, K, out_h, out_w * C).astype(jnp.float32)
    zeros_canvas = jnp.zeros(flat.shape, jnp.float32)

    def kernel(rshd_ref, residh_ref, rswd_ref, residw_ref, roih_ref,
               roiw_ref, feat_ref, grad_ref, zc_ref, dout_ref,
               win_scratch, emb1, emb2, rmw_scratch, sems):
        del zc_ref  # aliased storage of dout_ref
        b = pl.program_id(0)
        k = pl.program_id(1)

        window = lambda ref: ref.at[
            b, pl.ds(rshd_ref[b, k] * 8, win_h),
            pl.ds(rswd_ref[b, k] * (align * C), lane_w)]

        cp = pltpu.make_async_copy(window(feat_ref), win_scratch,
                                   sems.at[0])
        cp.start()
        cp.wait()
        win = win_scratch[...].astype(jnp.float32)
        win = pltpu.roll(win, win_h - residh_ref[b, k], 0)
        win = pltpu.roll(win, lane_w - residw_ref[b, k] * C, 1)

        # Recompute the forward's staged maxima (identical case logic).
        def select_case(variant_fn, cases, sel):
            out = variant_fn(cases[0])
            for rc in cases[1:]:
                out = jnp.where(sel == rc, variant_fn(rc), out)
            return out

        rows = select_case(lambda rc: _h_bin_max(win, rc, out_h),
                           roi_cases_h, roih_ref[b, k])
        m = select_case(
            lambda rc: _w_bin_max_flat(rows, rc, out_w, win_w, C),
            roi_cases_w, roiw_ref[b, k])

        g = grad_ref[0, 0]
        g = jnp.where(m < _NEG * 0.5, 0.0, g)   # empty bins emitted 0

        # Column unpool: spread g over the (out_h, lane_w) row-max grid.
        def col_unpool(rc):
            a, widths = _bin_plan(rc, out_w, win_w)
            offs = a - np.arange(out_w)
            emb1[...] = jnp.zeros((out_h, lane_w), jnp.float32)
            acc = jnp.zeros((out_h, lane_w), jnp.float32)
            if (offs == offs[0]).all() and (widths == widths[0]).all():
                j = int(offs[0])
                for t in range(int(widths[0])):
                    rows_sl = jax.lax.slice_in_dim(
                        rows, (j + t) * C, (j + t + out_w) * C, axis=1)
                    emb1[:, 0:out_w * C] = g * (rows_sl == m)
                    acc = acc + pltpu.roll(emb1[...], (j + t) * C, 1)
            else:
                for pi in range(out_w):
                    g_sl = jax.lax.slice_in_dim(g, pi * C, (pi + 1) * C,
                                                axis=1)
                    m_sl = jax.lax.slice_in_dim(m, pi * C, (pi + 1) * C,
                                                axis=1)
                    for t in range(int(widths[pi])):
                        col = int(a[pi]) + t
                        rows_sl = jax.lax.slice_in_dim(
                            rows, col * C, (col + 1) * C, axis=1)
                        emb1[:, 0:C] = g_sl * (rows_sl == m_sl)
                        acc = acc + pltpu.roll(emb1[...], col * C, 1)
            return acc

        gcol = select_case(col_unpool, roi_cases_w, roiw_ref[b, k])

        # Row unpool: spread gcol over the (win_h, lane_w) window.
        def row_unpool(rc):
            a, widths = _bin_plan(rc, out_h, win_h)
            offs = a - np.arange(out_h)
            emb2[...] = jnp.zeros((win_h, lane_w), jnp.float32)
            acc = jnp.zeros((win_h, lane_w), jnp.float32)
            if (offs == offs[0]).all() and (widths == widths[0]).all():
                j = int(offs[0])
                for t in range(int(widths[0])):
                    win_sl = jax.lax.slice_in_dim(
                        win, j + t, j + t + out_h, axis=0)
                    emb2[0:out_h, :] = gcol * (win_sl == rows)
                    acc = acc + pltpu.roll(emb2[...], j + t, 0)
            else:
                for pi in range(out_h):
                    gcol_sl = jax.lax.slice_in_dim(gcol, pi, pi + 1,
                                                   axis=0)
                    rows_sl = jax.lax.slice_in_dim(rows, pi, pi + 1,
                                                   axis=0)
                    for t in range(int(widths[pi])):
                        row = int(a[pi]) + t
                        win_sl = jax.lax.slice_in_dim(win, row, row + 1,
                                                      axis=0)
                        emb2[0:1, :] = gcol_sl * (win_sl == rows_sl)
                        acc = acc + pltpu.roll(emb2[...], row, 0)
            return acc

        G = select_case(row_unpool, roi_cases_h, roih_ref[b, k])

        # Back to window position, then serialized RMW accumulate.
        G = pltpu.roll(G, residh_ref[b, k], 0)
        G = pltpu.roll(G, residw_ref[b, k] * C, 1)

        rd = pltpu.make_async_copy(window(dout_ref), rmw_scratch,
                                   sems.at[1])
        rd.start()
        rd.wait()
        rmw_scratch[...] = rmw_scratch[...] + G
        wr = pltpu.make_async_copy(rmw_scratch, window(dout_ref),
                                   sems.at[2])
        wr.start()
        wr.wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(B, K),
        in_specs=[
            pl.BlockSpec(flat.shape, lambda b, k, *_: (0, 0, 0),
                         memory_space=pl.ANY),
            pl.BlockSpec((1, 1, out_h, out_w * C),
                         lambda b, k, *_: (b, k, 0, 0)),
            pl.BlockSpec(zeros_canvas.shape, lambda b, k, *_: (0, 0, 0),
                         memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(zeros_canvas.shape,
                               lambda b, k, *_: (0, 0, 0),
                               memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((win_h, lane_w), feature.dtype),
            pltpu.VMEM((out_h, lane_w), jnp.float32),
            pltpu.VMEM((win_h, lane_w), jnp.float32),
            pltpu.VMEM((win_h, lane_w), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )

    dcanvas = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(zeros_canvas.shape, jnp.float32),
        grid_spec=grid_spec,
        # inputs flatten as [6 scalars, feat, grad, zeros_canvas]; alias
        # the zero canvas to the output so the kernel can RMW it.
        input_output_aliases={8: 0},
        interpret=interpret,
    )(rs_h_div, resid_h, rs_w_div, resid_w, roi_h, roi_w, flat,
      grad_flat, zeros_canvas)

    if true_hw is not None:
        return dcanvas.reshape(feature.shape).astype(feature.dtype)
    full = dcanvas.reshape(B, H + win_h, W + win_w, C)
    return full[:, :H, :W].astype(feature.dtype)


def _roi_diff(feature, boxes, scale, out_size, box_size, interpret,
              true_hw):
    return roi_max_pool_pallas(feature, boxes, scale, out_size, box_size,
                               interpret, true_hw)


_roi_diff = jax.custom_vjp(_roi_diff, nondiff_argnums=(2, 3, 4, 5, 6))


def _roi_diff_fwd(feature, boxes, scale, out_size, box_size, interpret,
                  true_hw):
    out = roi_max_pool_pallas(feature, boxes, scale, out_size, box_size,
                              interpret, true_hw)
    return out, (feature, boxes)


def _roi_diff_bwd(scale, out_size, box_size, interpret, true_hw, res,
                  grad):
    feature, boxes = res
    dfeat = _roi_pool_bwd_pallas(feature, boxes, grad, scale, out_size,
                                 box_size, interpret, true_hw)
    return dfeat, jnp.zeros_like(boxes)


_roi_diff.defvjp(_roi_diff_fwd, _roi_diff_bwd)


def roi_max_pool_pallas_diff(feature: jnp.ndarray,
                             boxes: jnp.ndarray,
                             scale: float,
                             out_size: Tuple[int, int],
                             box_size: Tuple[int, int],
                             interpret: bool = False,
                             true_hw: Tuple[int, int] | None = None
                             ) -> jnp.ndarray:
    """`roi_max_pool_pallas` with a Pallas backward pass (custom VJP), for
    training paths (RCNet/networks.py:418-433 under autograd)."""
    return _roi_diff(feature, boxes, scale, out_size, box_size, interpret,
                     true_hw)


def roi_pool_pyramid_pallas_diff(latent: jnp.ndarray,
                                 skips: Sequence[jnp.ndarray],
                                 boxes: jnp.ndarray,
                                 patch_size: Tuple[int, int],
                                 interpret: bool = False,
                                 skip1_true_hw: Tuple[int, int] | None = None
                                 ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """Differentiable `roi_pool_pyramid_pallas` (every scale carries the
    Pallas VJP)."""
    ph, pw = patch_size
    pooled_skips = []
    for i, skip in enumerate(skips):
        s = 1.0 / (2 ** (i + 1))
        out = (int(ph * s), int(pw * s))
        hw = skip1_true_hw if i == 0 else None
        pooled_skips.append(
            roi_max_pool_pallas_diff(skip, boxes, s, out, patch_size,
                                     interpret, true_hw=hw))
    lat_stride = 2 ** (len(skips) + 1)
    latent_out = (ph // lat_stride, pw // lat_stride)
    pooled_latent = roi_max_pool_pallas_diff(
        latent, boxes, 1.0 / lat_stride, latent_out, patch_size, interpret)
    return pooled_latent, pooled_skips
