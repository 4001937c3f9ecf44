"""RC-Net: radar-pixel correspondence network (flax.linen, NHWC).

TPU-native re-design of RCNet/networks.py + rcnet_model.py:

* ``ResNetEncoder``     - ResNet18-style full-image encoder with 4 skip
                          scales down to /32 (networks.py:10-270);
* ``PointEncoder``      - 6-layer MLP lifting each radar (u, v, z) to a
                          latent token grid (networks.py:273-332);
* ``RCNetEncoder``      - full-image encode once, RoI-pool patch features at
                          every scale, LoFTR self/cross attention between
                          point tokens and patch tokens, concat fusion
                          (networks.py:335-451);
* ``MultiScaleDecoder`` - U-Net decoder from the fused latent back to a
                          per-pixel correspondence logit map over the patch
                          (networks.py:458-778, n_resolution=1 path);
* ``RCNet``             - the end-to-end module (rcnet_model.py:101-123).

The per-frame point axis K is a first-class batch dimension: the encoder
runs once per frame, and the (B, K) patch work is flattened to B*K - the
sharding axis the parallel layer splits over the mesh.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from riders_tpu.core.config import RCNetConfig
from riders_tpu.models.attention import LocalFeatureTransformer
from riders_tpu.models.layers import (
    ConvBlock,
    DecoderBlock,
    FullyConnected,
    FusedStemConv,
    ResNetBlock,
    activation_fn,
    max_pool_same,
)
from riders_tpu.ops.patches import roi_pool_pyramid_batched

Dtype = Any


def _pool_canvas(h: jnp.ndarray, ho: int, wo: int) -> jnp.ndarray:
    """MaxPool2d(3, 2, 1) over the (possibly RoI-padded) stem canvas,
    returning the true pooled extent (ceil(ho/2), ceil(wo/2)).

    Pooling the full canvas and slicing after is equivalent to slicing
    the canvas to (ho, wo) first (the _NEG fill and reduce_window's -inf
    padding are interchangeable under max); module-level so benchmarks
    can A/B the two orderings."""
    return max_pool_same(h, 3, 2)[:, :-(-ho // 2), :-(-wo // 2)]


class ResNetEncoder(nn.Module):
    """ResNet-18-style encoder with skips (networks.py:10-270).

    Returns (latent at /32, [skips at /2, /4, /8, /16]).  When
    ``skip1_roi_pad`` is set, skips[0] is a _NEG-padded canvas with those
    extra rows/cols (the RoI pooling kernel's input geometry - see
    FusedStemConv.roi_pad); its true extent is (ceil(H/2), ceil(W/2))."""

    n_filters: Sequence[int] = (32, 64, 128, 128, 128)
    activation: str = "leaky_relu"
    use_batch_norm: bool = True
    n_blocks_per_stage: int = 2
    dtype: Dtype = jnp.float32
    skip1_roi_pad: Optional[Tuple[int, int]] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        act = activation_fn(self.activation)
        skips: List[jnp.ndarray] = []
        ho, wo = -(-x.shape[-3] // 2), -(-x.shape[-2] // 2)

        # 1/1 -> 1/2: 7x7 stride-2 conv (Pallas-fused on bf16 inference)
        # with MaxPool2d(3, 2, 1) fused into the same kernel: the 4D
        # canvas (C=32 in lanes) is physically 4x lane-padded, so XLA's
        # reduce_window over it cost ~2 ms/call; pooling the rows while
        # they are still in VMEM makes it free.  (Earlier XLA-level pool
        # reformulations - flat-view pool, rows-then-cols split - were
        # neutral or worse, PERF.md round 3.)
        h, pooled = FusedStemConv(self.n_filters[0], 7, self.activation,
                                  self.use_batch_norm, dtype=self.dtype,
                                  roi_pad=self.skip1_roi_pad,
                                  fuse_pool=True,
                                  name="conv1")(x, train)
        skips.append(h)
        h = pooled
        for si, feat in enumerate(self.n_filters[1:]):
            stride = 1 if si == 0 else 2
            for bi in range(self.n_blocks_per_stage):
                h = ResNetBlock(feat, stride if bi == 0 else 1, act,
                                self.use_batch_norm, dtype=self.dtype,
                                name=f"blocks{si + 2}_{bi}")(h, train)
            if si < len(self.n_filters) - 2:
                skips.append(h)
        return h, skips


class PointEncoder(nn.Module):
    """6-layer MLP radar-point encoder (networks.py:273-332)."""

    n_neurons: Sequence[int] = (32, 64, 128, 128, 128)
    latent_size: int = 128 * 7 * 3
    activation: str = "leaky_relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, points: jnp.ndarray) -> jnp.ndarray:
        act = activation_fn(self.activation)
        h = points
        for i, feat in enumerate(self.n_neurons):
            h = FullyConnected(feat, act, dtype=self.dtype,
                               name=f"fc{i}")(h)
        return FullyConnected(self.latent_size, act, dtype=self.dtype,
                              name="fc_out")(h)


class MultiScaleDecoder(nn.Module):
    """U-Net decoder (networks.py:458-778), n_resolution 1..4.

    Walks the skip pyramid deep->shallow; the final block upsamples to
    `output_shape` without a skip, then a linear 3x3 conv emits logits.
    With ``n_resolution > 1`` the reference's multi-scale form is
    reproduced (networks.py:716-778): a linear `output{d}` conv taps each
    of the last `n_resolution - 1` scales, its bilinear
    align_corners x2 upsample is concatenated after the next block's
    encoder skip, and deconv0 consumes the upsampled 1/2-scale output as
    its skip; the return value is then the deep->shallow LIST of logits
    (the reference wrapper consumes `[-1]`, rcnet_model.py:119).

    On bf16 TPU inference the full-resolution tail (deconv0's x2 upsample +
    fusion conv + the output conv) runs entirely in PHASE space at quarter
    spatial size: the nearest-x2 composes into the upconv
    (layers.nearest2x_phase_kernel) and each following 3x3 conv composes
    with the depth-to-space via layers.phase_compose_3x3 - exact (nearest
    phases align with zero padding), with one cheap 1-channel
    depth-to-space at the very end.  This removes the two largest ops of
    the ZJU-geometry bench: the (B*K, 240, 100, 16) depth-to-space
    relayout and the full-resolution output conv (PERF.md round 3).
    ``phase_tail=None`` auto-selects (bf16, TPU, inference, exact-x2)."""

    n_filters: Sequence[int] = (256, 128, 64, 32, 16)
    output_shape: Tuple[int, int] = (240, 100)
    output_channels: int = 1
    activation: str = "leaky_relu"
    use_batch_norm: bool = True
    n_resolution: int = 1
    dtype: Dtype = jnp.float32
    phase_tail: Optional[bool] = None
    lane_decode: Optional[bool] = None
    lane_tail: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, skips: Sequence[jnp.ndarray],
                 train: bool = False) -> jnp.ndarray:
        from riders_tpu.ops.resize import resize2d

        assert 1 <= self.n_resolution < len(self.n_filters)
        act = activation_fn(self.activation)

        # Lane-major Pallas decode (ops/pallas/lane_decoder.py) is
        # OPT-IN: at the chip's true roofline (v5e, ~200 TF/s bf16) the
        # XLA decoder convs already run at 60-95% MXU and the lane
        # kernels' phase-stacked MAC inflation (16/9) nets out slower
        # (ZJU bench 341 vs 381 fps) - see PERF.md round-3 notes on the
        # corrected roofline.  Kept for N-in-lanes experimentation.
        lane = self.lane_decode
        if lane is None:
            import os
            lane = (self.dtype == jnp.bfloat16
                    and jax.default_backend() not in ("cpu",)
                    and os.environ.get("RIDERS_LANE_DECODE", "0") == "1")
        lane = (lane and not train and not self.is_initializing()
                and self.n_resolution == 1 and self.use_batch_norm
                and "leaky_relu" in self.activation
                and x.shape[0] % 128 == 0
                and tuple(self.output_shape) == (2 * skips[0].shape[-3],
                                                 2 * skips[0].shape[-2])
                and self.output_channels == 1)
        if lane:
            return self._decode_lane(
                x, skips, interpret=jax.default_backend() == "cpu")

        # Hybrid "lane tail" (OPT-IN, measured NEGATIVE): XLA convs for
        # the deep stages (deconv4..2) and the lane-major Pallas kernels
        # from deconv1 through the deconv0/output0 phase tail.  Same-
        # session A/B: ZJU 412.4 -> 371.7 fps, NTU 564.4 -> 505.8.  The
        # round-3 trace shows why: XLA's patch-minor fused tail convs
        # already run at ~110 TF/s (55% MXU; the hlo_stats FLOP column
        # proves compare_select_fusion.198 fuses BOTH tail phase convs),
        # while the lane kernels measure 40-50% on these shapes and add
        # to_lane conversion pads - see PERF.md round 3.  Kept for
        # experimentation: RIDERS_LANE_TAIL=1 or lane_tail=True.
        tail = self.lane_tail
        if tail is None:
            import os
            tail = (os.environ.get("RIDERS_LANE_TAIL", "0") == "1"
                    and self.dtype == jnp.bfloat16
                    and jax.default_backend() not in ("cpu",))
        tail = (tail and not train and not self.is_initializing()
                and self.n_resolution == 1 and self.use_batch_norm
                and "leaky_relu" in self.activation
                and x.shape[0] % 128 == 0
                and len(skips) >= 1
                and tuple(self.output_shape) == (2 * skips[0].shape[-3],
                                                 2 * skips[0].shape[-2])
                and self.output_channels == 1)

        h = x
        outputs = []
        up_prev = None
        # skips ordered shallow->deep; walk from the deepest.
        for i, feat in enumerate(self.n_filters[:-1]):
            d = 4 - i
            if tail and d == 1:
                return self._decode_lane_tail(
                    h, skips[0], interpret=jax.default_backend() == "cpu")
            skip = skips[len(skips) - 1 - i]
            if up_prev is not None:
                # Reference concat order: encoder skip first, then the
                # upsampled coarser output (networks.py:730).
                skip = jnp.concatenate(
                    [skip, up_prev.astype(skip.dtype)], axis=-1)
            h = DecoderBlock(feat, act, self.use_batch_norm, "up",
                             dtype=self.dtype,
                             name=f"deconv{d}")(h, skip=skip, train=train)
            if d in (3, 2, 1) and self.n_resolution > d:
                out = ConvBlock(self.output_channels, 3, 1, None, False,
                                dtype=self.dtype,
                                name=f"output{d}")(h, train)
                outputs.append(out)
                up_prev = resize2d(
                    out, (2 * out.shape[-3], 2 * out.shape[-2]),
                    "bilinear", align_corners=True)
            else:
                up_prev = None

        fast = self.phase_tail
        if fast is None:
            fast = (self.dtype == jnp.bfloat16
                    and jax.default_backend() not in ("cpu",))
        fast = (fast and not train and not self.is_initializing()
                and self.n_resolution == 1
                and tuple(self.output_shape) == (2 * h.shape[-3],
                                                 2 * h.shape[-2])
                and self.use_batch_norm)
        if not fast:
            if up_prev is not None:
                # n_resolution > 1: deconv0's skip is the upsampled
                # 1/2-scale output (networks.py:760-767, n != 0 branch).
                h = DecoderBlock(self.n_filters[-1], act,
                                 self.use_batch_norm, "up",
                                 dtype=self.dtype, name="deconv0")(
                                     h, skip=up_prev, train=train)
            else:
                h = DecoderBlock(self.n_filters[-1], act,
                                 self.use_batch_norm, "up",
                                 dtype=self.dtype, name="deconv0")(
                                     h, shape=self.output_shape, train=train)
            out0 = ConvBlock(self.output_channels, 3, 1, None, False,
                             dtype=self.dtype, name="output0")(h, train)
            if self.n_resolution > 1:
                return outputs + [out0]
            return out0

        from riders_tpu.models.layers import (depth_to_space2,
            nearest2x_phase_kernel, phase_compose_3x3)

        p = self.variables["params"]
        stats = self.variables["batch_stats"]

        def bn_fold(pp, ss):
            g = (pp["scale"] / jnp.sqrt(ss["var"] + 1e-5)).astype(
                jnp.float32)
            return g, pp["bias"] - ss["mean"] * g

        def phase_conv(z, keff, bn=None):
            out = jax.lax.conv_general_dilated(
                z.astype(self.dtype), keff.astype(self.dtype), (1, 1),
                [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            if bn is not None:
                g, b = bn
                out = out * jnp.tile(g, 4) + jnp.tile(b, 4)
            return out

        # deconv0's upconv: nearest x2 + conv -> phase tensor (.., h, w, 4F)
        k_up = p["deconv0"]["deconv"]["conv"]["conv"]["kernel"].astype(
            jnp.float32)
        z = phase_conv(h, nearest2x_phase_kernel(k_up),
                       bn_fold(p["deconv0"]["deconv"]["conv"]["bn"],
                               stats["deconv0"]["deconv"]["conv"]["bn"]))
        z = act(z.astype(self.dtype))
        # deconv0's fusion conv, composed with the depth-to-space.
        k_fuse = p["deconv0"]["conv"]["conv"]["kernel"].astype(jnp.float32)
        z = phase_conv(z, phase_compose_3x3(k_fuse),
                       bn_fold(p["deconv0"]["conv"]["bn"],
                               stats["deconv0"]["conv"]["bn"]))
        z = act(z.astype(self.dtype))
        # output conv (linear, no BN), still in phase space.
        k_out = p["output0"]["conv"]["kernel"].astype(jnp.float32)
        o = phase_conv(z, phase_compose_3x3(k_out))
        return depth_to_space2(o.astype(self.dtype), self.output_channels)

    def _decode_lane_tail(self, h: jnp.ndarray, skip1: jnp.ndarray,
                          interpret: bool = False) -> jnp.ndarray:
        """Lane-major finish of the decoder from deconv1 on.

        h: (B*K, h2, w2, C) - the XLA deconv2 output; skip1: the pooled
        /2-scale skip.  Runs deconv1 (upconv + fusion conv) and the
        deconv0 + output0 phase tail in the (H, W, C, N) Pallas kernels
        (ops/pallas/lane_decoder.py); the conversion transposes replace
        the relayout copies XLA inserts for its patch-minor conv layout,
        so the switch costs no extra data movement."""
        from riders_tpu.ops.pallas import lane_decoder as LD

        p = self.variables["params"]
        st = self.variables["batch_stats"]
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
        return self._lane_phase_tail(h1, interpret)

    def _lane_phase_tail(self, h1: jnp.ndarray, interpret: bool
                         ) -> jnp.ndarray:
        """deconv0 + output0 as depth-to-space-composed phase convs on a
        lane-major (h+2, w+2, C, N) tensor (shared by _decode_lane and
        _decode_lane_tail)."""
        from riders_tpu.ops.pallas import lane_decoder as LD
        from riders_tpu.models.layers import (depth_to_space2,
            nearest2x_phase_kernel, phase_compose_3x3)

        p = self.variables["params"]
        st = self.variables["batch_stats"]
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
        return depth_to_space2(o, 1).astype(self.dtype)

    def _decode_lane(self, x: jnp.ndarray, skips: Sequence[jnp.ndarray],
                     interpret: bool = False) -> jnp.ndarray:
        """Whole-decoder fast path in lane-major (H, W, C, N) layout
        (ops/pallas/lane_decoder.py): XLA's NHWC convs run at 4-7% MXU on
        the B*K patch batch; these kernels keep N in lanes and the conv
        taps on untiled dims (PERF.md round 3: deconv1 fusion conv 2.83
        -> 0.54 ms).  Exact-x2 stages fuse the nearest upsample into
        phase matmuls; irregular stages (e.g. 30x12 -> 60x25) take an
        untiled-dim slice-concat resize; deconv0 + output0 fuse into one
        kernel that never materializes the full-resolution map."""
        from riders_tpu.ops.pallas import lane_decoder as LD

        p = self.variables["params"]
        st = self.variables["batch_stats"]
        slope = 0.2
        h = LD.to_lane(x)
        n_stages = len(self.n_filters) - 1
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

        # Tail (deconv0 + output0): the depth-to-space-composed phase
        # convs (layers.nearest2x_phase_kernel / phase_compose_3x3) ARE
        # plain 3x3 convs on the (h/2-grid, 4F, N) phase tensor, so the
        # full-resolution map never exists - one cheap 1-channel
        # depth-to-space at the very end.
        return self._lane_phase_tail(h, interpret)


class RCNet(nn.Module):
    """End-to-end RC-Net over a padded point bucket.

    __call__(image, points, boxes, point_mask):
      image: (B, H, W, 3) normalized full frame (already edge-padded by
        patch//2 per side, datasets.py:177-182 / rcnet_main.py:441-444).
      points: (B, K, 3) radar (u, v, z) in padded-image coordinates.
      boxes: (B, K, 4) [x1, y1, x2, y2] patch boxes.
      point_mask: (B, K) validity of the padded bucket.
    Returns logits (B, K, patch_h, patch_w, 1).
    """

    config: RCNetConfig = RCNetConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jnp.ndarray, points: jnp.ndarray,
                 boxes: jnp.ndarray, point_mask: Optional[jnp.ndarray] = None,
                 train: bool = False, return_logits: bool = True,
                 return_all_scales: bool = False) -> jnp.ndarray:
        cfg = self.config
        B, K = points.shape[:2]
        lh, lw = cfg.latent_shape
        d_model = cfg.n_neurons_encoder_depth[-1]

        from riders_tpu.ops.pallas.roi_pool import roi_window_pad

        s1_pad = roi_window_pad(cfg.patch_size, 0.5,
                                cfg.n_filters_encoder_image[0])
        latent, skips = ResNetEncoder(
            cfg.n_filters_encoder_image, cfg.activation, cfg.use_batch_norm,
            dtype=self.dtype, skip1_roi_pad=s1_pad,
            name="encoder_image")(image, train)
        s1_hw = (-(-image.shape[-3] // 2), -(-image.shape[-2] // 2))

        # Training uses the custom-VJP Pallas pool (scatter-to-argmax
        # backward); on CPU both modes fall back to the XLA formulation,
        # which is differentiable as written.
        pooled_latent, pooled_skips = roi_pool_pyramid_batched(
            latent, skips, boxes, cfg.patch_size,
            skip1_true_hw=s1_hw, differentiable=train)
        # -> (B, K, h, w, C) each; flatten the frame x point axes.
        flat = lambda t: t.reshape((B * K,) + t.shape[2:])
        pooled_latent = flat(pooled_latent)
        pooled_skips = [flat(s) for s in pooled_skips]

        # Point branch: MLP -> (B*K, lh*lw, d) token grid
        # (networks.py:438-443; channel-major reshape as in torch .view).
        pts = points.reshape(B * K, points.shape[-1])
        point_latent = PointEncoder(
            cfg.n_neurons_encoder_depth, d_model * lh * lw, cfg.activation,
            dtype=self.dtype, name="encoder_depth")(pts)
        point_tokens = point_latent.reshape(B * K, d_model, lh * lw)
        point_tokens = point_tokens.transpose(0, 2, 1)

        image_tokens = pooled_latent.reshape(B * K, lh * lw,
                                             pooled_latent.shape[-1])

        point_tokens, image_tokens = LocalFeatureTransformer(
            d_model=d_model, nhead=cfg.attention_heads,
            layer_types=("self", "cross"), n_layers=cfg.attention_layers,
            dtype=self.dtype, name="attention")(point_tokens, image_tokens)

        # Concat fusion (networks.py:450): image features first.
        fused = jnp.concatenate([
            image_tokens.reshape(B * K, lh, lw, -1),
            point_tokens.reshape(B * K, lh, lw, -1)], axis=-1)

        outs = MultiScaleDecoder(
            cfg.n_filters_decoder, cfg.patch_size, 1, cfg.activation,
            cfg.use_batch_norm, n_resolution=cfg.n_resolution,
            dtype=self.dtype, name="decoder")(fused, pooled_skips, train)
        if not isinstance(outs, (list, tuple)):
            outs = [outs]

        def finalize(logits):
            logits = logits.reshape(B, K, *logits.shape[-3:])
            if point_mask is not None:
                logits = jnp.where(point_mask[:, :, None, None, None] > 0,
                                   logits, -1e4 if return_logits else 0.0)
            if return_logits:
                return logits
            return jax.nn.sigmoid(logits) * (
                point_mask[:, :, None, None, None]
                if point_mask is not None else 1.0)

        if return_all_scales:
            # Deep->shallow logits list for multi-scale supervision
            # (the reference decoder's list form, networks.py:778).
            return [finalize(o) for o in outs]
        # The reference wrapper consumes only the full-resolution output
        # (rcnet_model.py:119 `[-1]`).
        return finalize(outs[-1])
