"""Scale Map Learner (SML): MiDaS-small-style scale regression network.

TPU-native re-design of modules/midas/midas_net_custom.py:22-257 and
modules/midas/blocks.py: a learned 3->3 stem, EfficientNet-Lite3 encoder,
four RefineNet-style fusion blocks with expand channels [64,128,256,512],
and an output conv head.  The network regresses a multiplicative scale map:

    scales = relu(1 + out);  pred = d * scales          (scale mode)

with inverse-depth clamps pred <= 1/min_pred, pred >= 1/max_pred
(midas_net_custom.py:121-130).  `regress_mode='depth'` reproduces
MidasNet_small_depth (:207-257) which returns relu(1+out) directly.

Fusion-block upsamples use bilinear align_corners=True and the output head's
x2 upsample uses align_corners=False, matching the reference's mixed
conventions exactly (blocks.py:168-170, 187).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from riders_tpu.core.config import SMLConfig
from riders_tpu.models.efficientnet import (EfficientNetLite3,
    LITE3_STAGES, LITE3_TAPS)
from riders_tpu.ops.resize import resize2d

Dtype = Any


class ResidualConvUnit(nn.Module):
    """relu-conv-relu-conv residual unit (blocks.py:67-122); convs have
    bias, no BN in the SML configuration."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = nn.relu(x)
        out = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                      use_bias=True, dtype=self.dtype, name="conv1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                      use_bias=True, dtype=self.dtype, name="conv2")(out)
        return out + x


class FeatureFusionBlock(nn.Module):
    """RefineNet-style fusion (blocks.py:125-174): optional skip through a
    residual unit, residual unit, x2 bilinear upsample (align_corners
    configurable), 1x1 out conv halving channels when `expand`."""

    features: int
    expand: bool = False
    align_corners: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 skip: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        out = x
        if skip is not None:
            out = out + ResidualConvUnit(self.features, dtype=self.dtype,
                                         name="res_conf_unit1")(skip)
        out = ResidualConvUnit(self.features, dtype=self.dtype,
                               name="res_conf_unit2")(out)
        out = resize2d(out, (2 * out.shape[-3], 2 * out.shape[-2]),
                       method="bilinear", align_corners=self.align_corners)
        out_features = self.features // 2 if self.expand else self.features
        return nn.Conv(out_features, (1, 1), use_bias=True, dtype=self.dtype,
                       name="out_conv")(out)


# Bilinear x2 (align_corners=False) taps composed through a 3-tap conv:
# out[2i+phase] = sum_d M_phase[j, d] * K[d] applied to x[i+j-1]
# (up[2i] = 0.25 x[i-1] + 0.75 x[i]; up[2i+1] = 0.75 x[i] + 0.25 x[i+1]).
_M_PHASE = (
    np.asarray([[0.75, 0.25, 0.0],
                [0.25, 0.75, 0.75],
                [0.0, 0.0, 0.25]], np.float32),
    np.asarray([[0.25, 0.0, 0.0],
                [0.75, 0.75, 0.25],
                [0.0, 0.25, 0.75]], np.float32),
)


class OutputConv(nn.Module):
    """Output head (blocks.py:177-196): conv3 -> x2 bilinear (ac=False) ->
    conv3 -> relu -> conv1.

    ``fast_upsample`` computes the same head without materializing the
    upsampled feature map: the bilinear x2 and the following 3x3 conv
    compose into four phase convs at LOW resolution (effective kernels
    M_py K M_px^T), with the relu + 1x1 also applied per phase and the
    2-pixel output borders (where the upsample's edge clamp and the
    conv's zero pad break the interior formula) recomputed exactly via
    the naive path on thin strips.  On the 640x512 bench the naive head
    costs ~3.7 ms/call of 36 in resize matmuls, relayout copies and a
    full-resolution conv (PERF.md); the fast head works on 4x fewer
    pixels with no relayouts.  Defaults on for bf16 (production)
    inference; the f32 path keeps the literal reference formulation.
    """

    features: int
    dtype: Dtype = jnp.float32
    fast_upsample: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv1 = nn.Conv(self.features // 2, (3, 3),
                        padding=[(1, 1), (1, 1)], use_bias=True,
                        dtype=self.dtype, name="conv1")
        conv2 = nn.Conv(32, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=True, dtype=self.dtype, name="conv2")
        conv3 = nn.Conv(1, (1, 1), use_bias=True, dtype=self.dtype,
                        name="conv3")

        def tail(up):
            return conv3(nn.relu(conv2(up)))

        h = conv1(x)
        fast = self.fast_upsample
        if fast is None:
            fast = self.dtype == jnp.bfloat16
        if self.is_initializing() or not fast:
            up = resize2d(h, (2 * h.shape[-3], 2 * h.shape[-2]),
                          method="bilinear", align_corners=False)
            return tail(up)

        params = self.variables["params"]
        k2 = params["conv2"]["kernel"].astype(jnp.float32)
        b2 = params["conv2"]["bias"]
        w3 = params["conv3"]["kernel"]
        b3 = params["conv3"]["bias"]

        n, m = h.shape[-3], h.shape[-2]
        cm = k2.shape[-1]

        # all four phase kernels as one conv (Cout = 4*cm), then the relu
        # and the per-phase 1x1 as one block-diagonal projection - a
        # single full-lane MXU conv instead of four quarter-lane ones
        keff = jnp.concatenate(
            [jnp.einsum("ja,abio,lb->jlio", jnp.asarray(_M_PHASE[py]), k2,
                        jnp.asarray(_M_PHASE[px]))
             for py in range(2) for px in range(2)], axis=-1)
        z = jax.lax.conv_general_dilated(
            h, keff.astype(h.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        z = nn.relu(z + jnp.tile(b2, 4))
        w3_blk = jax.scipy.linalg.block_diag(
            *([w3[0, 0].astype(z.dtype)] * 4))          # (4*cm, 4)
        grid = (z @ w3_blk) + b3                        # (B, n, m, 4)
        # phase (py, px) at channel 2*py + px -> interleave
        grid = grid.reshape(h.shape[:-3] + (n, m, 2, 2))
        grid = jnp.moveaxis(grid, (-2, -1), (-3, -1))   # (B, n, 2, m, 2)
        out = grid.reshape(h.shape[:-3] + (2 * n, 2 * m, 1))

        # exact borders: the interior phase formula assumes pure 2-tap
        # upsampling and in-range conv windows; recompute 2-pixel strips
        # through the naive path (resize2d row/col matrices carry the
        # same edge clamps on any extent, so thin slices are exact).
        top = tail(resize2d(h[..., :3, :, :], (6, 2 * m),
                            "bilinear", False))[..., :2, :, :]
        bot = tail(resize2d(h[..., -3:, :, :], (6, 2 * m),
                            "bilinear", False))[..., -2:, :, :]
        out = jnp.concatenate(
            [top.astype(out.dtype), out[..., 2:-2, :, :],
             bot.astype(out.dtype)], axis=-3)
        left = tail(resize2d(h[..., :, :3, :], (2 * n, 6),
                             "bilinear", False))[..., :, :2, :]
        right = tail(resize2d(h[..., :, -3:, :], (2 * n, 6),
                              "bilinear", False))[..., :, -2:, :]
        return jnp.concatenate(
            [left.astype(out.dtype), out[..., :, 2:-2, :],
             right.astype(out.dtype)], axis=-2)


class ScaleMapLearner(nn.Module):
    """The full SML network.

    __call__(x, d):
      x: (N, H, W, in_channels) network input - (int_depth_norm,
         int_scales_norm, gray) channels (val_zju.py:189-193).
      d: (N, H, W, 1) unnormalized aligned inverse depth.
    Returns (pred, scales): (N, H, W, 1) inverse-depth prediction and the
    regressed scale map.
    """

    config: SMLConfig = SMLConfig()
    dtype: Dtype = jnp.float32
    backbone_stages: tuple = LITE3_STAGES
    backbone_taps: tuple = LITE3_TAPS
    backbone_stem: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray, d: jnp.ndarray,
                 train: bool = False):
        cfg = self.config
        f = cfg.features
        f1, f2, f3, f4 = ((f, 2 * f, 4 * f, 8 * f) if cfg.expand
                          else (f, f, f, f))

        # Learned stem: in_channels -> 3, BN, ReLU (midas_net_custom.py:64-69).
        h = nn.Conv(3, (3, 3), padding=[(1, 1), (1, 1)], use_bias=True,
                    dtype=self.dtype, name="first_conv")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="first_bn")(h)
        h = nn.relu(h)

        l1, l2, l3, l4 = EfficientNetLite3(
            dtype=self.dtype, stages=self.backbone_stages,
            taps=self.backbone_taps, stem_features=self.backbone_stem,
            name="pretrained")(h, train)

        # Reassembly convs (blocks.py:15-41), bias-free.
        rn = lambda feat, name: nn.Conv(
            feat, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            dtype=self.dtype, name=name)
        l1_rn = rn(f1, "layer1_rn")(l1)
        l2_rn = rn(f2, "layer2_rn")(l2)
        l3_rn = rn(f3, "layer3_rn")(l3)
        l4_rn = rn(f4, "layer4_rn")(l4)

        ac = cfg.align_corners
        p4 = FeatureFusionBlock(f4, expand=cfg.expand, align_corners=ac,
                                dtype=self.dtype, name="refinenet4")(l4_rn)
        p3 = FeatureFusionBlock(f3, expand=cfg.expand, align_corners=ac,
                                dtype=self.dtype, name="refinenet3")(p4, l3_rn)
        p2 = FeatureFusionBlock(f2, expand=cfg.expand, align_corners=ac,
                                dtype=self.dtype, name="refinenet2")(p3, l2_rn)
        p1 = FeatureFusionBlock(f1, expand=False, align_corners=ac,
                                dtype=self.dtype, name="refinenet1")(p2, l1_rn)

        out = OutputConv(f, dtype=self.dtype, name="output_conv")(p1)
        out = out.astype(jnp.float32)

        scales = nn.relu(1.0 + out)
        if cfg.regress_mode == "depth":
            pred = scales
        else:
            pred = d.astype(jnp.float32) * scales

        # Inverse-depth clamps (midas_net_custom.py:124-130).
        if cfg.min_pred is not None and cfg.min_pred > 0:
            pred = jnp.minimum(pred, 1.0 / cfg.min_pred)
        if cfg.max_pred is not None:
            pred = jnp.maximum(pred, 1.0 / cfg.max_pred)
        return pred, scales
