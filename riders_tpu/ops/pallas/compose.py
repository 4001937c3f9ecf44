"""Pallas TPU kernel for quasi-dense patch composition.

The XLA formulation of compose_patches (ops/patches.py) is a lax.scan of
K dynamic-update-slices on three (Hp, Wp) HBM canvases - each tiny update
round-trips HBM and serializes (~11 ms per batch-8 call at 640x512).  This
kernel keeps all three accumulators in VMEM for the whole composition:

  grid = (B,); per frame the kernel zeroes three f32 VMEM canvases, loops
  the K point patches with aligned windowed read-modify-writes entirely in
  VMEM, then emits the cropped depth / response maps.

Mosaic requires dynamic VMEM slice offsets to be aligned (sublane multiple
of 8, lane multiple of 128), so each patch window is placed at the aligned
floor of its position and the crop is shifted into place inside the window
with `pltpu.roll` (dynamic rotate, residual < tile).  The canvas origin is
offset so the final image crop is itself tile-aligned and static.

Point coordinates ride in SMEM via scalar prefetch.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def compose_patches_pallas(responses: jnp.ndarray,
                           points: jnp.ndarray,
                           point_mask: jnp.ndarray,
                           image_shape: Tuple[int, int],
                           patch_size: Tuple[int, int],
                           response_threshold: jnp.ndarray | float,
                           interpret: bool = False
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched composition (rcnet_main.py:460-487 semantics).

    Args:
      responses: (B, K, ph, pw) sigmoid responses.
      points: (B, K, 3) (u, v, z) in padded-image coordinates.
      point_mask: (B, K) bucket validity.
      response_threshold: scalar or (B,) per-frame thresholds.
    Returns (depth, response): (B, H, W) maps.
    """
    B, K, ph, pw = responses.shape
    H, W = image_shape
    pad_y, pad_x = ph // 2, pw // 2
    Hp, Wp = H + 2 * pad_y, W + 2 * pad_x

    # Align the canvas so the image crop [pad_y:pad_y+H, pad_x:pad_x+W]
    # starts at a (8, 128)-aligned position.
    off_y = (-pad_y) % 8
    off_x = (-pad_x) % 128
    crop_y = pad_y + off_y
    crop_x = pad_x + off_x

    # Patch window: aligned start + rolled residual placement.
    win_h = _round_up(ph + 8, 8)
    win_w = _round_up(pw + 128, 128)
    # Largest window write position: placement start <= (Hp-ph)+off_y and
    # <= (Wp-pw)+off_x.
    ch = _round_up(Hp - ph + off_y + win_h, 8)
    cw = _round_up(Wp - pw + off_x + win_w, 128)

    u = jnp.round(points[..., 0]).astype(jnp.int32)
    v = jnp.round(points[..., 1]).astype(jnp.int32)
    y0 = jnp.clip(v - pad_y, 0, Hp - ph) + off_y
    x0 = jnp.clip(u - pad_x, 0, Wp - pw) + off_x
    z = points[..., 2].astype(jnp.float32) * point_mask
    resp = responses.astype(jnp.float32) * point_mask[:, :, None, None]

    if jnp.ndim(response_threshold) > 0:
        thr = jnp.broadcast_to(
            jnp.asarray(response_threshold, jnp.float32).reshape(-1), (B,))
    else:
        thr = jnp.full((B,), response_threshold, jnp.float32)

    # Chunk the K axis across grid steps (canvases persist in scratch) so
    # the tile-padded response block fits VMEM at any batch size.
    kc = K
    while kc > 8:
        kc //= 2
    while K % kc != 0:
        kc -= 1
    n_chunks = K // kc

    # Emit the cropped maps in H-bands over EXTRA grid steps rather than
    # holding full (H, W) output blocks resident: the full-frame blocks
    # double-buffer to ~5 MB at 640x512 and, together with the three
    # canvases (~9.3 MB at the ZJU patch geometry), overflowed the 16 MB
    # scoped-VMEM limit (batch 20/24 failed to compile - PERF.md).  Bands
    # keep the resident output footprint ~0.6 MB at any batch size.
    band_h = H
    for cand in range(H, 7, -8):
        if H % cand == 0 and cand % 8 == 0 and cand * W * 4 <= 512 * 1024:
            band_h = cand
            break
    n_emit = H // band_h
    n_steps = n_chunks + n_emit

    def kernel(y0_ref, x0_ref, z_ref, thr_ref, resp_ref,
               depth_out, resp_out, sum_r, sum_rz, max_r):
        b = pl.program_id(0)
        c = pl.program_id(1)
        t = thr_ref[b]

        @pl.when(c == 0)
        def _():
            zero = jnp.zeros((ch, cw), jnp.float32)
            sum_r[:] = zero
            sum_rz[:] = zero
            max_r[:] = zero

        def body(j, _):
            k = c * kc + j
            ya = (y0_ref[b, k] // 8) * 8
            xa = (x0_ref[b, k] // 128) * 128
            ry = y0_ref[b, k] - ya
            rx = x0_ref[b, k] - xa
            zk = z_ref[b, k]

            crop = resp_ref[0, j]
            crop = jnp.where(crop < t, 0.0, crop)
            placed = jnp.pad(crop, ((0, win_h - ph), (0, win_w - pw)))
            placed = pltpu.roll(placed, ry, 0)
            placed = pltpu.roll(placed, rx, 1)

            ys, xs = pl.ds(ya, win_h), pl.ds(xa, win_w)
            sum_r[ys, xs] = sum_r[ys, xs] + placed
            sum_rz[ys, xs] = sum_rz[ys, xs] + placed * zk
            max_r[ys, xs] = jnp.maximum(max_r[ys, xs], placed)
            return 0

        @pl.when(c < n_chunks)
        def _():
            jax.lax.fori_loop(0, kc, body, 0)

        @pl.when(c >= n_chunks)
        def _():
            y = crop_y + (c - n_chunks) * band_h    # 8-aligned: crop_y
            ys = pl.ds(y, band_h)                   # and band_h are
            xs = pl.ds(crop_x, W)                   # multiples of 8
            m = max_r[ys, xs]
            s = sum_r[ys, xs]
            sz = sum_rz[ys, xs]
            depth_out[0] = jnp.where(m > 0,
                                     sz / jnp.where(s > 0, s, 1.0), 0.0)
            resp_out[0] = m

    def out_idx(b, c, *_):
        return (b, jnp.maximum(c - n_chunks, 0), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,      # y0, x0, z, thr
        grid=(B, n_steps),
        in_specs=[
            pl.BlockSpec((1, kc, ph, pw),
                         lambda b, c, *_: (b, jnp.minimum(c, n_chunks - 1),
                                           0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, band_h, W), out_idx),
            pl.BlockSpec((1, band_h, W), out_idx),
        ),
        scratch_shapes=[
            pltpu.VMEM((ch, cw), jnp.float32),
            pltpu.VMEM((ch, cw), jnp.float32),
            pltpu.VMEM((ch, cw), jnp.float32),
        ],
    )

    depth, response = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((B, H, W), jnp.float32),
                   jax.ShapeDtypeStruct((B, H, W), jnp.float32)),
        grid_spec=grid_spec,
        interpret=interpret,
    )(y0, x0, z, thr, resp)
    return depth, response
