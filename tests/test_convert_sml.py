"""End-to-end SML converter test against a torch twin.

The twin reproduces MidasNet_small_videpth's module layout (first stem,
gen-efficientnet layer slicing with tf-SAME convs, scratch/refinenet/
output_conv naming) with a shrunken single-repeat stage plan; converted
weights must produce fp32-identical predictions.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from riders_tpu.core.config import SMLConfig
from riders_tpu.models import convert
from riders_tpu.models.sml import ScaleMapLearner

# (kernel, stride, expand, out_channels, repeats=1) - one block per stage
TINY_STAGES = (
    (3, 1, 1, 8, 1),
    (3, 2, 6, 8, 1),
    (5, 2, 6, 12, 1),
    (3, 2, 6, 16, 1),
    (5, 1, 6, 16, 1),
    (5, 2, 6, 24, 1),
    (3, 1, 6, 24, 1),
)
STEM = 8
FEATURES = 8


class Conv2dSame(nn.Conv2d):
    def forward(self, x):
        ih, iw = x.shape[-2:]
        kh, kw = self.kernel_size
        sh, sw = self.stride
        ph = max((-(-ih // sh) - 1) * sh + kh - ih, 0)
        pw = max((-(-iw // sw) - 1) * sw + kw - iw, 0)
        x = F.pad(x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2])
        return F.conv2d(x, self.weight, self.bias, self.stride, 0,
                        self.dilation, self.groups)


class TDS(nn.Module):
    def __init__(self, cin, cout, k, s):
        super().__init__()
        self.conv_dw = Conv2dSame(cin, cin, k, s, groups=cin, bias=False)
        self.bn1 = nn.BatchNorm2d(cin, eps=1e-3)
        self.conv_pw = nn.Conv2d(cin, cout, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout, eps=1e-3)
        self.res = (s == 1 and cin == cout)

    def forward(self, x):
        h = F.relu6(self.bn1(self.conv_dw(x)))
        h = self.bn2(self.conv_pw(h))
        return h + x if self.res else h


class TMB(nn.Module):
    def __init__(self, cin, cout, k, s, e):
        super().__init__()
        mid = cin * e
        self.conv_pw = nn.Conv2d(cin, mid, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(mid, eps=1e-3)
        self.conv_dw = Conv2dSame(mid, mid, k, s, groups=mid, bias=False)
        self.bn2 = nn.BatchNorm2d(mid, eps=1e-3)
        self.conv_pwl = nn.Conv2d(mid, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout, eps=1e-3)
        self.res = (s == 1 and cin == cout)

    def forward(self, x):
        h = F.relu6(self.bn1(self.conv_pw(x)))
        h = F.relu6(self.bn2(self.conv_dw(h)))
        h = self.bn3(self.conv_pwl(h))
        return h + x if self.res else h


class TRCU(nn.Module):
    def __init__(self, f):
        super().__init__()
        self.conv1 = nn.Conv2d(f, f, 3, 1, 1)
        self.conv2 = nn.Conv2d(f, f, 3, 1, 1)

    def forward(self, x):
        out = self.conv1(F.relu(x))
        out = self.conv2(F.relu(out))
        return out + x


class TFusion(nn.Module):
    def __init__(self, f, expand, has_skip):
        super().__init__()
        fo = f // 2 if expand else f
        self.out_conv = nn.Conv2d(f, fo, 1)
        self.resConfUnit2 = TRCU(f)
        if has_skip:
            self.resConfUnit1 = TRCU(f)

    def forward(self, x, skip=None):
        out = x
        if skip is not None:
            out = out + self.resConfUnit1(skip)
        out = self.resConfUnit2(out)
        out = F.interpolate(out, scale_factor=2, mode="bilinear",
                            align_corners=True)
        return self.out_conv(out)


class TSML(nn.Module):
    def __init__(self):
        super().__init__()
        self.first = nn.Sequential(nn.Conv2d(3, 3, 3, 1, 1),
                                   nn.BatchNorm2d(3), nn.ReLU(True))

        def block(si):
            k, s, e, c, _ = TINY_STAGES[si]
            cin = STEM if si == 0 else TINY_STAGES[si - 1][3]
            return nn.Sequential(
                TDS(cin, c, k, s) if e == 1 else TMB(cin, c, k, s, e))

        pre = nn.Module()
        pre.layer1 = nn.Sequential(
            Conv2dSame(3, STEM, 3, 2, bias=False), nn.BatchNorm2d(STEM,
                                                                  eps=1e-3),
            nn.ReLU6(True), block(0), block(1))
        pre.layer2 = nn.Sequential(block(2))
        pre.layer3 = nn.Sequential(block(3), block(4))
        pre.layer4 = nn.Sequential(block(5), block(6))
        self.pretrained = pre

        f = FEATURES
        taps = (TINY_STAGES[1][3], TINY_STAGES[2][3], TINY_STAGES[4][3],
                TINY_STAGES[6][3])
        scratch = nn.Module()
        scratch.layer1_rn = nn.Conv2d(taps[0], f, 3, 1, 1, bias=False)
        scratch.layer2_rn = nn.Conv2d(taps[1], 2 * f, 3, 1, 1, bias=False)
        scratch.layer3_rn = nn.Conv2d(taps[2], 4 * f, 3, 1, 1, bias=False)
        scratch.layer4_rn = nn.Conv2d(taps[3], 8 * f, 3, 1, 1, bias=False)
        scratch.refinenet4 = TFusion(8 * f, True, has_skip=False)
        scratch.refinenet3 = TFusion(4 * f, True, has_skip=True)
        scratch.refinenet2 = TFusion(2 * f, True, has_skip=True)
        scratch.refinenet1 = TFusion(f, False, has_skip=True)
        scratch.output_conv = nn.Sequential(
            nn.Conv2d(f, f // 2, 3, 1, 1),
            nn.Upsample(scale_factor=2, mode="bilinear"),
            nn.Conv2d(f // 2, 32, 3, 1, 1),
            nn.ReLU(False),
            nn.Conv2d(32, 1, 1))
        self.scratch = scratch

    def forward(self, x, d):
        l0 = self.first(x)
        l1 = self.pretrained.layer1(l0)
        l2 = self.pretrained.layer2(l1)
        l3 = self.pretrained.layer3(l2)
        l4 = self.pretrained.layer4(l3)
        r1 = self.scratch.layer1_rn(l1)
        r2 = self.scratch.layer2_rn(l2)
        r3 = self.scratch.layer3_rn(l3)
        r4 = self.scratch.layer4_rn(l4)
        p4 = self.scratch.refinenet4(r4)
        p3 = self.scratch.refinenet3(p4, r3)
        p2 = self.scratch.refinenet2(p3, r2)
        p1 = self.scratch.refinenet1(p2, r1)
        out = self.scratch.output_conv(p1)
        scales = F.relu(1.0 + out)
        pred = d * scales
        pred = torch.clamp(pred, max=1.0 / 0.1)
        pred = torch.clamp(pred, min=1.0 / 255.0)
        return pred


@pytest.mark.slow
def test_sml_converter_end_to_end(rng):
    torch.manual_seed(0)
    tmodel = TSML().eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.normal_(1.0, 0.1)
                m.bias.normal_(0, 0.1)

    sd = {k: np.asarray(v.numpy()) for k, v in tmodel.state_dict().items()}
    variables = convert.convert_sml_state_dict(sd, stages=TINY_STAGES)

    cfg = SMLConfig(net_shape=(64, 96), features=FEATURES, expand=True,
                    min_pred=0.1, max_pred=255.0)
    model = ScaleMapLearner(config=cfg, backbone_stages=TINY_STAGES,
                            backbone_stem=STEM)

    x = rng.standard_normal((1, 64, 96, 3)).astype(np.float32)
    d = (rng.random((1, 64, 96, 1)) * 5).astype(np.float32)

    template = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(x),
                                   jnp.asarray(d))
    problems = convert.check_tree_matches(
        variables["params"], jax.device_get(template)["params"])
    problems += convert.check_tree_matches(
        variables["batch_stats"], jax.device_get(template)["batch_stats"])
    assert not problems, problems[:10]

    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                     torch.from_numpy(d.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)

    pred, _ = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), jnp.asarray(d))
    np.testing.assert_allclose(np.asarray(pred), ref, atol=3e-4, rtol=1e-3)
