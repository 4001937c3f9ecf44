"""EfficientNet-Lite3 encoder backbone (flax.linen, NHWC).

The reference SML pulls `tf_efficientnet_lite3` from torch.hub and slices it
into four feature stages (modules/midas/blocks.py:44-64), tapping channels
[32, 48, 136, 384] at strides /4, /8, /16, /32.  This is a from-scratch
TPU-native implementation of the same topology:

* EfficientNet-B0 stage plan scaled by width 1.2 / depth 1.4 with the
  "lite" modifications: fixed 32-ch stem and fixed repeats on the first and
  last stage, no squeeze-excite, ReLU6 activations;
* TF 'SAME' asymmetric padding (XLA-native) so converted TF-style weights
  are numerically exact;
* BatchNorm eps 1e-3 (TF convention).

Stage table (lite3):
  stem  conv3x3 s2 -> 32
  s0    DS   k3 s1 e1 -> 24   x1   (fixed repeat)
  s1    MB   k3 s2 e6 -> 32   x3      } tap1: 32 ch @ /4
  s2    MB   k5 s2 e6 -> 48   x3      } tap2: 48 ch @ /8
  s3    MB   k3 s2 e6 -> 96   x5
  s4    MB   k5 s1 e6 -> 136  x5      } tap3: 136 ch @ /16
  s5    MB   k5 s2 e6 -> 232  x6
  s6    MB   k3 s1 e6 -> 384  x1 (fixed)  } tap4: 384 ch @ /32
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# (kernel, stride, expand, out_channels, repeats)
LITE3_STAGES: Tuple[Tuple[int, int, int, int, int], ...] = (
    (3, 1, 1, 24, 1),
    (3, 2, 6, 32, 3),
    (5, 2, 6, 48, 3),
    (3, 2, 6, 96, 5),
    (5, 1, 6, 136, 5),
    (5, 2, 6, 232, 6),
    (3, 1, 6, 384, 1),
)

# MiDaS taps the backbone after these stage indices (blocks.py:54-64:
# layer1 = stem+stages 0-1, layer2 = stage 2, layer3 = stages 3-4,
# layer4 = stages 5-6).
LITE3_TAPS: Tuple[int, ...] = (1, 2, 4, 6)
LITE3_TAP_CHANNELS: Tuple[int, ...] = (32, 48, 136, 384)


def relu6(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.minimum(nn.relu(x), 6.0)


class _BN(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-3, dtype=self.dtype, name="bn")(x)


class DepthwiseSeparable(nn.Module):
    """Lite stage-0 block: dw3x3 + BN + relu6, pw1x1 + BN (no act)."""

    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        h = nn.Conv(in_ch, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding="SAME",
                    feature_group_count=in_ch, use_bias=False,
                    dtype=self.dtype, name="conv_dw")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, dtype=self.dtype, name="bn1")(h)
        h = relu6(h)
        h = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_pw")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, dtype=self.dtype, name="bn2")(h)
        if self.stride == 1 and in_ch == self.features:
            h = h + x
        return h


class MBConv(nn.Module):
    """Inverted-residual block, lite variant (no squeeze-excite)."""

    features: int
    kernel: int = 3
    stride: int = 1
    expand: int = 6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        mid = in_ch * self.expand
        h = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_pw")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, dtype=self.dtype, name="bn1")(h)
        h = relu6(h)
        h = nn.Conv(mid, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding="SAME",
                    feature_group_count=mid, use_bias=False,
                    dtype=self.dtype, name="conv_dw")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, dtype=self.dtype, name="bn2")(h)
        h = relu6(h)
        h = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_pwl")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, dtype=self.dtype, name="bn3")(h)
        if self.stride == 1 and in_ch == self.features:
            h = h + x
        return h


class EfficientNetLite3(nn.Module):
    """Backbone returning the four MiDaS feature taps.

    Input: (N, H, W, 3) with H, W multiples of 32.
    Output: list of 4 feature maps, channels (32, 48, 136, 384) at strides
    (/4, /8, /16, /32).  `stages`/`taps`/`stem_features` default to the
    lite3 plan; tests shrink them.
    """

    dtype: Dtype = jnp.float32
    stages: Tuple[Tuple[int, int, int, int, int], ...] = LITE3_STAGES
    taps: Tuple[int, ...] = LITE3_TAPS
    stem_features: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> List[jnp.ndarray]:
        # NOTE: the fused Pallas stem (ops/pallas/stem.py, which supports
        # this stem's TF-SAME/relu6 configuration via lead=0 + clip_max)
        # was tried here and REGRESSED the fused bench 525 -> 409 fps: at
        # the SML's (288, 352) extent the kernel's host-side tap
        # transpose and per-block overheads outweigh the conv win
        # (PERF.md).  The literal XLA formulation stays.
        h = nn.Conv(self.stem_features, (3, 3), strides=(2, 2),
                    padding="SAME",
                    use_bias=False, dtype=self.dtype, name="conv_stem")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, dtype=self.dtype, name="bn_stem")(h)
        h = relu6(h)

        taps: List[jnp.ndarray] = []
        for si, (k, s, e, c, r) in enumerate(self.stages):
            for bi in range(r):
                stride = s if bi == 0 else 1
                name = f"stage{si}_block{bi}"
                if e == 1:
                    h = DepthwiseSeparable(c, k, stride, dtype=self.dtype,
                                           name=name)(h, train)
                else:
                    h = MBConv(c, k, stride, e, dtype=self.dtype,
                               name=name)(h, train)
            if si in self.taps:
                taps.append(h)
        return taps
