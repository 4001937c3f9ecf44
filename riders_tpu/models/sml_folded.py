"""W-folded SML forward: the fused pipeline's fast path for midas-small.

Computes EXACTLY the same function as ``ScaleMapLearner.apply`` (same
params pytree, same products, f32 accumulation) but runs the
large-spatial/low-channel front of the network - the learned 3->3 stem,
the EfficientNet-Lite3 conv_stem, and stages 0-2 - on a W-folded
(B, H, W/4, 4*C) canvas (ops/fold.py), where every conv is full-lane
MXU work and the layout copies XLA inserts around 3-32 channel convs
disappear.  PERF.md round-4 rollup: the literal SML stage costs
7.65 ms/call for <0.3 TFLOP on the ZJU bench, with the first_conv chain
(0.85 ms, mostly layout copies around a 3-lane conv) and the
quarter-lane effnet pw convs (4-20 TF/s) as the named offenders.

The deep stages (3-6), refinenets and output head run unfolded through
the ORIGINAL flax submodules applied with scoped variable subtrees, so
their numerics are the module path's by construction.  Reference
anchor: modules/midas/midas_net_custom.py:64-133 (the forward this
re-executes) - the fold is a TPU layout choice, not a model change.

MEASURED NEGATIVE RESULT (round 5, PERF.md "Round-5 W-folded SML
stage"): same-session ZJU A/B 401.5 fps folded vs 442.3 unfolded.  The
trace shows the folded front costs 3.39 ms where the literal front cost
2.25 ms: the folded convs themselves break even (the 4x FLOP inflation
of phase-folded kernels cancels the 4x lane-occupancy win at these op
sizes - the stage is op-count-bound, not lane-bound), and the refolds
around stride-2 blocks (1.09 ms) plus the entry fold relayout are pure
loss.  The path is therefore OPT-IN (RIDERS_SML_FOLD=1) and kept as a
parity-tested experiment; production inference uses the literal module.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from riders_tpu.models.efficientnet import (LITE3_STAGES, LITE3_TAPS,
                                            DepthwiseSeparable, MBConv,
                                            relu6)
from riders_tpu.models.sml import (FeatureFusionBlock, OutputConv,
                                   ScaleMapLearner)
from riders_tpu.ops import fold


def supports_folding(sml: ScaleMapLearner, net_shape: Tuple[int, int]
                     ) -> bool:
    """Folded forward covers the production midas-small configuration:
    the lite3 stage plan, 3 input channels, net W a multiple of 32."""
    return (tuple(sml.backbone_stages) == LITE3_STAGES
            and tuple(sml.backbone_taps) == LITE3_TAPS
            and sml.backbone_stem == 32
            and sml.config.in_channels == 3
            and net_shape[1] % 32 == 0
            and os.environ.get("RIDERS_SML_FOLD", "0") == "1")


def _bn(x: jnp.ndarray, params: Dict[str, Any], stats: Dict[str, Any],
        eps: float, F: int, dtype) -> jnp.ndarray:
    """flax BatchNorm (inference) on an F-folded tensor: parameters tile
    across the phase groups; op order and dtype promotion mirror
    flax.linen.normalization exactly."""
    def t(v):
        return jnp.tile(v, F).astype(dtype)
    y = x.astype(dtype) - t(stats["mean"])
    mul = jax.lax.rsqrt(t(stats["var"]) + jnp.asarray(eps, dtype))
    mul = mul * t(params["scale"])
    return y * mul + t(params["bias"])


def _folded_mbconv(h, F, p, s, *, stride, pads_h, pad_w_left,
                   residual, dtype):
    """MBConv (models/efficientnet.py:93-124) on an F-folded canvas.
    `h` enters F-folded; stride-2 blocks refold to 2F before the
    depthwise so the output stays F-folded."""
    x_in = h
    h = fold.folded_pointwise(h, p["conv_pw"]["kernel"][0, 0], F,
                              dtype=dtype)
    h = _bn(h, p["bn1"], s["bn1"], 1e-3, F, dtype)
    h = relu6(h)
    F_in = F * stride
    if stride > 1:
        h = fold.refold_w(h, F, F_in)
    h = fold.folded_depthwise(
        h, p["conv_dw"]["kernel"].astype(dtype), F_in=F_in, F_out=F,
        stride=(stride, stride), pad_h=pads_h, pad_w_left=pad_w_left)
    h = _bn(h, p["bn2"], s["bn2"], 1e-3, F, dtype)
    h = relu6(h)
    h = fold.folded_pointwise(h, p["conv_pwl"]["kernel"][0, 0], F,
                              dtype=dtype)
    h = _bn(h, p["bn3"], s["bn3"], 1e-3, F, dtype)
    if residual:
        h = h + x_in
    return h


def folded_sml_apply(sml: ScaleMapLearner, variables,
                     x: jnp.ndarray, d: jnp.ndarray):
    """Drop-in for ``sml.apply(variables, x, d, train=False)``."""
    cfg = sml.config
    dtype = sml.dtype
    pr = variables["params"]
    st = variables["batch_stats"]
    pp, ps = pr["pretrained"], st["pretrained"]
    B, H, W, _ = x.shape

    # ---- folded front: learned stem + conv_stem + stages 0-2 ----
    h = fold.fold_w(x.astype(dtype), 4)
    h = fold.folded_conv(
        h, pr["first_conv"]["kernel"].astype(dtype), F_in=4, F_out=4,
        stride=(1, 1), pad_h=(1, 1), pad_w_left=1, dtype=dtype)
    h = h + jnp.tile(pr["first_conv"]["bias"], 4).astype(dtype)
    h = _bn(h, pr["first_bn"], st["first_bn"], 1e-5, 4, dtype)
    h = nn.relu(h)

    h = fold.refold_w(h, 4, 8)
    h = fold.folded_conv(
        h, pp["conv_stem"]["kernel"].astype(dtype), F_in=8, F_out=4,
        stride=(2, 2), pad_h=fold.tf_same_pads(H, 3, 2),
        pad_w_left=fold.tf_same_pads(W, 3, 2)[0], dtype=dtype)
    h = _bn(h, pp["bn_stem"], ps["bn_stem"], 1e-3, 4, dtype)
    h = relu6(h)
    Hc, Wc = H // 2, W // 2

    # stage 0: DepthwiseSeparable (dw k3 s1, pw 32->24), no residual.
    p0, s0 = pp["stage0_block0"], ps["stage0_block0"]
    h = fold.folded_depthwise(
        h, p0["conv_dw"]["kernel"].astype(dtype), F_in=4, F_out=4,
        stride=(1, 1), pad_h=fold.tf_same_pads(Hc, 3, 1),
        pad_w_left=fold.tf_same_pads(Wc, 3, 1)[0])
    h = _bn(h, p0["bn1"], s0["bn1"], 1e-3, 4, dtype)
    h = relu6(h)
    h = fold.folded_pointwise(h, p0["conv_pw"]["kernel"][0, 0], 4,
                              dtype=dtype)
    h = _bn(h, p0["bn2"], s0["bn2"], 1e-3, 4, dtype)

    taps = []
    Hs, Ws = Hc, Wc                               # spatial extent at `h`
    for si in (1, 2):
        k, s2_, e, c, r = LITE3_STAGES[si]
        for bi in range(r):
            stride = s2_ if bi == 0 else 1
            name = f"stage{si}_block{bi}"
            in_ch = h.shape[-1] // 4
            h = _folded_mbconv(
                h, 4, pp[name], ps[name], stride=stride,
                pads_h=fold.tf_same_pads(Hs, k, stride),
                pad_w_left=fold.tf_same_pads(Ws, k, stride)[0],
                residual=(stride == 1 and in_ch == c), dtype=dtype)
            Hs, Ws = Hs // stride, Ws // stride
        taps.append(fold.unfold_w(h, 4))

    l1, l2 = taps                                 # /4 x32, /8 x48

    # ---- unfolded tail: original flax submodules, scoped subtrees ----
    def run_block(h, si, bi, stride):
        k, _, e, c, _ = LITE3_STAGES[si]
        name = f"stage{si}_block{bi}"
        mod = MBConv(c, k, stride, e, dtype=dtype)
        return mod.apply({"params": pp[name], "batch_stats": ps[name]}, h)

    h = l2
    tail_taps = {}
    for si in range(3, 7):
        k, s2_, e, c, r = LITE3_STAGES[si]
        for bi in range(r):
            h = run_block(h, si, bi, s2_ if bi == 0 else 1)
        if si in LITE3_TAPS:
            tail_taps[si] = h
    l3, l4 = tail_taps[4], tail_taps[6]           # /16 x136, /32 x384

    f = cfg.features
    f1, f2, f3, f4 = ((f, 2 * f, 4 * f, 8 * f) if cfg.expand
                      else (f, f, f, f))

    def rn(feat, name, v):
        return nn.Conv(feat, (3, 3), padding=[(1, 1), (1, 1)],
                       use_bias=False, dtype=dtype).apply(
                           {"params": pr[name]}, v)

    l1_rn, l2_rn = rn(f1, "layer1_rn", l1), rn(f2, "layer2_rn", l2)
    l3_rn, l4_rn = rn(f3, "layer3_rn", l3), rn(f4, "layer4_rn", l4)

    ac = cfg.align_corners

    def ffb(feat, expand, name, *args):
        return FeatureFusionBlock(feat, expand=expand, align_corners=ac,
                                  dtype=dtype).apply(
                                      {"params": pr[name]}, *args)

    p4 = ffb(f4, cfg.expand, "refinenet4", l4_rn)
    p3 = ffb(f3, cfg.expand, "refinenet3", p4, l3_rn)
    p2 = ffb(f2, cfg.expand, "refinenet2", p3, l2_rn)
    p1 = ffb(f1, False, "refinenet1", p2, l1_rn)

    out = OutputConv(f, dtype=dtype).apply(
        {"params": pr["output_conv"]}, p1)
    out = out.astype(jnp.float32)

    scales = nn.relu(1.0 + out)
    if cfg.regress_mode == "depth":
        pred = scales
    else:
        pred = d.astype(jnp.float32) * scales
    if cfg.min_pred is not None and cfg.min_pred > 0:
        pred = jnp.minimum(pred, 1.0 / cfg.min_pred)
    if cfg.max_pred is not None:
        pred = jnp.maximum(pred, 1.0 / cfg.max_pred)
    return pred, scales
