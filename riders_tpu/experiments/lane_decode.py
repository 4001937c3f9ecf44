"""Lane-major Pallas decode paths for MultiScaleDecoder (EXPERIMENTAL).

Round-3 negative results, kept for N-in-lanes experimentation (PERF.md):

* ``decode_full`` — the whole decoder in (H, W, C, N) layout
  (ops/pallas/lane_decoder.py).  At the corrected v5e roofline
  (~200 TF/s bf16) XLA's patch-minor decoder convs already run at
  60-95% MXU, and the lane kernels' phase-stacked MAC inflation (16/9)
  nets out slower: ZJU bench 341 vs 381 fps, NTU 465 vs 524.
* ``decode_tail`` — hybrid: XLA for deconv4..2, lane kernels from
  deconv1 through the deconv0/output0 phase tail.  Same-session A/B:
  ZJU 412.4 -> 371.7 fps, NTU 564.4 -> 505.8.  hlo_stats shows why: XLA
  fuses BOTH tail phase convs into one op at ~110 TF/s (55% MXU), while
  the lane kernels measure 40-50% in-pipeline and add to_lane
  conversion pads.

Opt in with ``MultiScaleDecoder(lane_mode="full")`` or ``"tail"`` —
inference-only (n_resolution == 1, batch-norm leaky-relu decoder,
exact-x2 output, patch batch a multiple of 128; asserted here).  Parity
coverage: tests/test_lane_decoder.py (both ZJU and NTU geometries).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def _check_eligible(dec, n_batch: int, skip1) -> None:
    assert dec.n_resolution == 1 and dec.use_batch_norm, (
        "lane_mode requires the single-resolution batch-norm decoder")
    assert "leaky_relu" in dec.activation and dec.output_channels == 1
    # decode_full hardcodes the 5-deep block walk (deconv4..1 + the
    # deconv0/output0 phase tail); the depth-6/7 decoders the production
    # path supports would silently walk the wrong deconv names here.
    assert len(dec.n_filters) == 5, (
        "lane_mode only supports the default depth-5 decoder, got "
        f"n_filters={tuple(dec.n_filters)}")
    assert n_batch % 128 == 0, "patch batch must be a multiple of 128"
    assert tuple(dec.output_shape) == (2 * skip1.shape[-3],
                                       2 * skip1.shape[-2]), (
        "lane_mode requires an exact-x2 full-resolution output")


def decode_full(dec, x: jnp.ndarray, skips: Sequence[jnp.ndarray]
                ) -> jnp.ndarray:
    """Whole-decoder lane-major path (see module docstring).

    Exact-x2 stages fuse the nearest upsample into phase matmuls;
    irregular stages (e.g. 30x12 -> 60x25) take an untiled-dim
    slice-concat resize; deconv0 + output0 fuse into one kernel that
    never materializes the full-resolution map."""
    from riders_tpu.ops.pallas import lane_decoder as LD

    _check_eligible(dec, x.shape[0], skips[0])
    interpret = jax.default_backend() == "cpu"
    p = dec.variables["params"]
    st = dec.variables["batch_stats"]
    slope = 0.2
    h = LD.to_lane(x)
    n_stages = len(dec.n_filters) - 1
    for i in range(n_stages):
        d = 4 - i
        skip = skips[len(skips) - 1 - i]
        th, tw = skip.shape[-3], skip.shape[-2]
        pd, sd = p[f"deconv{d}"], st[f"deconv{d}"]
        k_up = pd["deconv"]["conv"]["conv"]["kernel"]
        sb_up = LD.bn_fold(pd["deconv"]["conv"]["bn"],
                           sd["deconv"]["conv"]["bn"])
        if (th, tw) == (2 * (h.shape[0] - 2), 2 * (h.shape[1] - 2)):
            up = LD.lane_upconv2x(h, k_up, *sb_up, slope,
                                  interpret=interpret)
        else:
            up = LD.lane_conv3x3(
                [LD.nearest_resize_lane(h, (th, tw))], [k_up],
                *sb_up, slope, interpret=interpret)
        f = int(k_up.shape[3])
        k_f = pd["conv"]["conv"]["kernel"]
        sb_f = LD.bn_fold(pd["conv"]["bn"], sd["conv"]["bn"])
        h = LD.lane_conv3x3(
            [up, LD.to_lane(skip)], [k_f[:, :, :f], k_f[:, :, f:]],
            *sb_f, slope, interpret=interpret)

    return _lane_phase_tail(dec, h, interpret)


def decode_tail(dec, h: jnp.ndarray, skip1: jnp.ndarray) -> jnp.ndarray:
    """Lane-major finish of the decoder from deconv1 on.

    h: (B*K, h2, w2, C) — the XLA deconv2 output; skip1: the pooled
    /2-scale skip.  Runs deconv1 (upconv + fusion conv) and the
    deconv0 + output0 phase tail in the (H, W, C, N) Pallas kernels;
    the conversion transposes replace the relayout copies XLA inserts
    for its patch-minor conv layout, so the switch costs no extra data
    movement (but still loses end to end — module docstring)."""
    from riders_tpu.ops.pallas import lane_decoder as LD

    _check_eligible(dec, h.shape[0], skip1)
    interpret = jax.default_backend() == "cpu"
    p = dec.variables["params"]
    st = dec.variables["batch_stats"]
    slope = 0.2
    th, tw = skip1.shape[-3], skip1.shape[-2]

    pd, sd = p["deconv1"], st["deconv1"]
    k_up = pd["deconv"]["conv"]["conv"]["kernel"]
    sb_up = LD.bn_fold(pd["deconv"]["conv"]["bn"],
                       sd["deconv"]["conv"]["bn"])
    hl = LD.to_lane(h)
    if (th, tw) == (2 * h.shape[-3], 2 * h.shape[-2]):
        up = LD.lane_upconv2x(hl, k_up, *sb_up, slope,
                              interpret=interpret)
    else:
        up = LD.lane_conv3x3(
            [LD.nearest_resize_lane(hl, (th, tw))], [k_up],
            *sb_up, slope, interpret=interpret)
    f = int(k_up.shape[3])
    k_f = pd["conv"]["conv"]["kernel"]
    sb_f = LD.bn_fold(pd["conv"]["bn"], sd["conv"]["bn"])
    h1 = LD.lane_conv3x3(
        [up, LD.to_lane(skip1)], [k_f[:, :, :f], k_f[:, :, f:]],
        *sb_f, slope, interpret=interpret)
    return _lane_phase_tail(dec, h1, interpret)


def _lane_phase_tail(dec, h1: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    """deconv0 + output0 as depth-to-space-composed phase convs on a
    lane-major (h+2, w+2, C, N) tensor (shared by decode_full and
    decode_tail)."""
    from riders_tpu.ops.pallas import lane_decoder as LD
    from riders_tpu.models.layers import (depth_to_space2,
        nearest2x_phase_kernel, phase_compose_3x3)

    p = dec.variables["params"]
    st = dec.variables["batch_stats"]
    slope = 0.2
    p0, s0 = p["deconv0"], st["deconv0"]
    k_up0 = nearest2x_phase_kernel(
        p0["deconv"]["conv"]["conv"]["kernel"].astype(jnp.float32))
    g, b = LD.bn_fold(p0["deconv"]["conv"]["bn"],
                      s0["deconv"]["conv"]["bn"])
    u = LD.lane_conv3x3([h1], [k_up0], jnp.tile(g, 4), jnp.tile(b, 4),
                        slope, interpret=interpret)
    k_f0 = phase_compose_3x3(
        p0["conv"]["conv"]["kernel"].astype(jnp.float32))
    g, b = LD.bn_fold(p0["conv"]["bn"], s0["conv"]["bn"])
    m = LD.lane_conv3x3([u], [k_f0], jnp.tile(g, 4), jnp.tile(b, 4),
                        slope, interpret=interpret)
    k_o = phase_compose_3x3(
        p["output0"]["conv"]["kernel"].astype(jnp.float32))
    k_o = jnp.pad(k_o, ((0, 0), (0, 0), (0, 0), (0, 4)))  # Co 4 -> 8
    o = LD.lane_conv3x3([m], [k_o], None, None, None, out_pad=0,
                        interpret=interpret)
    o = jnp.transpose(o[:, :, :4], (3, 0, 1, 2))  # (N, h/2, w/2, 4)
    return depth_to_space2(o, 1).astype(dec.dtype)
