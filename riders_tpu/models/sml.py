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

import jax.numpy as jnp
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


class OutputConv(nn.Module):
    """Output head (blocks.py:177-196): conv3 -> x2 bilinear (ac=False) ->
    conv3 -> relu -> conv1."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(self.features // 2, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=True, dtype=self.dtype, name="conv1")(x)
        x = resize2d(x, (2 * x.shape[-3], 2 * x.shape[-2]),
                     method="bilinear", align_corners=False)
        x = nn.Conv(32, (3, 3), padding=[(1, 1), (1, 1)], use_bias=True,
                    dtype=self.dtype, name="conv2")(x)
        x = nn.relu(x)
        return nn.Conv(1, (1, 1), use_bias=True, dtype=self.dtype,
                       name="conv3")(x)


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
