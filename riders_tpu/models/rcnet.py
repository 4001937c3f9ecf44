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
    # W-fold the stem canvas on the Pallas path (layers.FusedStemConv
    # fold_w; requires n_filters[0] == 32): skips[0] then has channel
    # dim 4*C with lane (w%4)*C + c, for the folded RoI pool kernel.
    fold_skip1: bool = False

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
                                  fold_w=self.fold_skip1,
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
    ``phase_tail=None`` auto-selects (bf16, TPU, inference, exact-x2).

    ``lane_mode`` ("full" / "tail") opts into the EXPERIMENTAL lane-major
    Pallas decode paths — measured net-negative on both bench geometries;
    see riders_tpu/experiments/lane_decode.py for the numbers."""

    n_filters: Sequence[int] = (256, 128, 64, 32, 16)
    output_shape: Tuple[int, int] = (240, 100)
    output_channels: int = 1
    activation: str = "leaky_relu"
    use_batch_norm: bool = True
    n_resolution: int = 1
    output_func: str = "linear"
    dtype: Dtype = jnp.float32
    phase_tail: Optional[bool] = None
    lane_mode: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, skips: Sequence[jnp.ndarray],
                 train: bool = False) -> jnp.ndarray:
        from riders_tpu.ops.resize import resize2d

        depth = len(self.n_filters)
        assert depth < 8, "Does not support network depth of 8 or more"
        # 'upsample' forces multi-scale: the final output IS the x2
        # upsample of output1 (networks.py:508-510, :761-763).
        upsample_out = "upsample" in self.output_func
        n_res = max(self.n_resolution, 2) if upsample_out \
            else self.n_resolution
        assert 1 <= n_res < depth
        assert self.lane_mode in (None, "full", "tail")
        act = activation_fn(self.activation)
        # Output-conv activation (networks.py:505-506): None for linear
        # and for a bare 'upsample' (whose output convs are linear).
        out_act = None if (self.output_func == "upsample"
                           or "linear" in self.output_func) \
            else activation_fn(self.output_func)

        if (self.lane_mode == "full" and not train
                and not self.is_initializing()):
            from riders_tpu.experiments import lane_decode
            return lane_decode.decode_full(self, x, skips)

        h = x
        outputs = []
        up_prev = None
        # skips ordered shallow->deep; walk from the deepest
        # (networks.py:692-758; blocks named deconv{depth-1}..deconv1
        # here, deconv0 below - deconv6/deconv5 appear at depth 7/6).
        for i, feat in enumerate(self.n_filters[:-1]):
            d = depth - 1 - i
            if (self.lane_mode == "tail" and d == 1 and not train
                    and not self.is_initializing()):
                from riders_tpu.experiments import lane_decode
                return lane_decode.decode_tail(self, h, skips[0])
            si = len(skips) - 1 - i
            skip = skips[si] if si >= 0 else None
            if up_prev is not None:
                # Reference concat order: encoder skip first, then the
                # upsampled coarser output (networks.py:730).
                skip = up_prev.astype(h.dtype) if skip is None else \
                    jnp.concatenate(
                        [skip, up_prev.astype(skip.dtype)], axis=-1)
            h = DecoderBlock(feat, act, self.use_batch_norm, "up",
                             dtype=self.dtype,
                             name=f"deconv{d}")(h, skip=skip, train=train)
            if d in (3, 2, 1) and n_res > d:
                out = ConvBlock(self.output_channels, 3, 1, out_act, False,
                                dtype=self.dtype,
                                name=f"output{d}")(h, train)
                outputs.append(out)
                up_prev = resize2d(
                    out, (2 * out.shape[-3], 2 * out.shape[-2]),
                    "bilinear", align_corners=True)
            else:
                up_prev = None

        if upsample_out:
            # output0 = bilinear x2 of output1; deconv0/output0 unused
            # (networks.py:761-763).
            return outputs + [up_prev]

        fast = self.phase_tail
        if fast is None:
            fast = (self.dtype == jnp.bfloat16
                    and jax.default_backend() not in ("cpu",))
        fast = (fast and not train and not self.is_initializing()
                and n_res == 1 and out_act is None
                and tuple(self.output_shape) == (2 * h.shape[-3],
                                                 2 * h.shape[-2])
                and self.use_batch_norm)
        if not fast:
            if up_prev is not None:
                # n_resolution > 1: deconv0's skip is the upsampled
                # 1/2-scale output, plus skips[0] iff the pyramid is as
                # deep as the decoder (n == 0, networks.py:765-767).
                skip0 = up_prev if len(skips) != depth else \
                    jnp.concatenate(
                        [skips[0], up_prev.astype(skips[0].dtype)],
                        axis=-1)
                h = DecoderBlock(self.n_filters[-1], act,
                                 self.use_batch_norm, "up",
                                 dtype=self.dtype, name="deconv0")(
                                     h, skip=skip0, train=train)
            elif len(skips) == depth:
                # n == 0 at deconv0 (networks.py:769-770).
                h = DecoderBlock(self.n_filters[-1], act,
                                 self.use_batch_norm, "up",
                                 dtype=self.dtype, name="deconv0")(
                                     h, skip=skips[0], train=train)
            else:
                h = DecoderBlock(self.n_filters[-1], act,
                                 self.use_batch_norm, "up",
                                 dtype=self.dtype, name="deconv0")(
                                     h, shape=self.output_shape, train=train)
            out0 = ConvBlock(self.output_channels, 3, 1, out_act, False,
                             dtype=self.dtype, name="output0")(h, train)
            if n_res > 1:
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

        from riders_tpu.ops.pallas.roi_pool import roi_window_pad_folded

        c1 = cfg.n_filters_encoder_image[0]
        s1_pad = roi_window_pad_folded(cfg.patch_size, 0.5, c1)
        latent, skips = ResNetEncoder(
            cfg.n_filters_encoder_image, cfg.activation, cfg.use_batch_norm,
            dtype=self.dtype, skip1_roi_pad=s1_pad,
            fold_skip1=(c1 * 4 == 128),
            name="encoder_image")(image, train)
        s1_hw = (-(-image.shape[-3] // 2), -(-image.shape[-2] // 2))

        # Training uses the custom-VJP Pallas pool (scatter-to-argmax
        # backward); on CPU both modes fall back to the XLA formulation,
        # which is differentiable as written.  A folded stem canvas
        # (4*C channel dim - bf16 TPU inference only) routes skips[0] to
        # the folded pool kernel.
        s1_fold = c1 if skips[0].shape[-1] == 4 * c1 else None
        pooled_latent, pooled_skips = roi_pool_pyramid_batched(
            latent, skips, boxes, cfg.patch_size,
            skip1_true_hw=s1_hw, differentiable=train,
            skip1_folded_channels=s1_fold)
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
