"""dpt_hybrid (vitb_rn50_384) converter parity against a torch twin.

The twin reproduces the timm `vit_base_resnet50_384` checkpoint key
layout the reference instantiates (backbones/vit.py:120-221,
`_make_pretrained_vitb_rn50_384`, hooks [0, 1, 8, 11]): a truncated
non-preact ResNetV2-50 patch-embed backbone (TF-SAME weight-standardized
convs + GroupNorm, stages 3/4/9), a 1x1 token projection, ViT-B/16
blocks, the runtime pos-embed interpolation of backbones/vit.py:16-30,
and the DPT hybrid assembly where taps 1-2 are raw resnet stage maps
and taps 3-4 go through readout reassembly.  Converted weights must
produce near-fp32-identical predictions at the REAL ViT-B dimensions.
"""

import dataclasses

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

import test_convert_dpt as tcd
from riders_tpu.models import convert
from riders_tpu.models.dpt import DPTScaleMapLearner

HYBRID_DIMS = dict(DIM=768, HEADS=12, DEPTH=12, GRID=24,
                   REASSEMBLE=(256, 512, 768, 768), FEATURES=256,
                   HOOKS=(0, 1, 8, 11))


class TStdConv(nn.Conv2d):
    """timm StdConv2dSame: weight standardization + TF-SAME padding."""

    def forward(self, x):
        w = self.weight
        w = (w - w.mean(dim=(1, 2, 3), keepdim=True)) / (
            w.var(dim=(1, 2, 3), keepdim=True, unbiased=False)
            + 1e-6).sqrt()
        ih, iw = x.shape[-2:]
        kh, kw = w.shape[-2:]
        s = self.stride[0]
        ph = max((-(-ih // s) - 1) * s + kh - ih, 0)
        pw = max((-(-iw // s) - 1) * s + kw - iw, 0)
        x = F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))
        return F.conv2d(x, w, self.bias, self.stride, 0)


def _maxpool_same(x, k=3, s=2):
    ih, iw = x.shape[-2:]
    ph = max((-(-ih // s) - 1) * s + k - ih, 0)
    pw = max((-(-iw // s) - 1) * s + k - iw, 0)
    x = F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2),
              value=float("-inf"))
    return F.max_pool2d(x, k, s)


class TBottleneck(nn.Module):
    """timm resnetv2 non-preact Bottleneck (conv-norm-act x3 +
    projection shortcut)."""

    def __init__(self, cin, cout, stride):
        super().__init__()
        mid = cout // 4
        self.conv1 = TStdConv(cin, mid, 1, bias=False)
        self.norm1 = nn.GroupNorm(32, mid)
        self.conv2 = TStdConv(mid, mid, 3, stride=stride, bias=False)
        self.norm2 = nn.GroupNorm(32, mid)
        self.conv3 = TStdConv(mid, cout, 1, bias=False)
        self.norm3 = nn.GroupNorm(32, cout)
        if stride != 1 or cin != cout:
            ds = nn.Module()
            ds.conv = TStdConv(cin, cout, 1, stride=stride, bias=False)
            ds.norm = nn.GroupNorm(32, cout)
            self.downsample = ds
        else:
            self.downsample = None

    def forward(self, x):
        sc = x if self.downsample is None else \
            self.downsample.norm(self.downsample.conv(x))
        h = F.relu(self.norm1(self.conv1(x)))
        h = F.relu(self.norm2(self.conv2(h)))
        h = self.norm3(self.conv3(h))
        return F.relu(h + sc)


class TResNetV2(nn.Module):
    """Truncated ResNetV2-50: 'same' stem + stages (3, 4, 9)."""

    def __init__(self):
        super().__init__()
        stem = nn.Module()
        stem.conv = TStdConv(3, 64, 7, stride=2, bias=False)
        stem.norm = nn.GroupNorm(32, 64)
        self.stem = stem
        stages = []
        cin = 64
        for si, (n, c) in enumerate(zip((3, 4, 9), (256, 512, 1024))):
            blocks = []
            for bi in range(n):
                stride = 2 if (si > 0 and bi == 0) else 1
                blocks.append(TBottleneck(cin, c, stride))
                cin = c
            st = nn.Module()
            st.blocks = nn.Sequential(*blocks)
            stages.append(st)
        self.stages = nn.ModuleList(stages)

    def forward(self, x):
        h = _maxpool_same(F.relu(self.stem.norm(self.stem.conv(x))))
        outs = []
        for st in self.stages:
            h = st.blocks(h)
            outs.append(h)
        return outs     # /4, /8, /16


class THybridViT(nn.Module):
    """timm vit_base_resnet50_384 exposing the checkpoint key layout and
    the (f4, f8, token-taps) activations DPT hybrid hooks."""

    def __init__(self):
        super().__init__()
        D = tcd.DIM
        self.cls_token = nn.Parameter(torch.zeros(1, 1, D))
        self.pos_embed = nn.Parameter(
            torch.zeros(1, tcd.GRID * tcd.GRID + 1, D))
        pe = nn.Module()
        pe.backbone = TResNetV2()
        pe.proj = nn.Conv2d(1024, D, 1)
        self.patch_embed = pe
        self.blocks = nn.ModuleList(tcd.TBlock(False)
                                    for _ in range(tcd.DEPTH))

    def forward_features(self, x):
        f4, f8, f16 = self.patch_embed.backbone(x)
        h = self.patch_embed.proj(f16)
        B, D, gh, gw = h.shape
        h = h.flatten(2).transpose(1, 2)
        h = torch.cat((self.cls_token.expand(B, -1, -1), h), dim=1)
        if h.shape[1] != self.pos_embed.shape[1]:
            # backbones/vit.py:16-30 runtime pos-embed interpolation
            tok, grid = self.pos_embed[:, :1], self.pos_embed[0, 1:]
            gs = int(round(len(grid) ** 0.5))
            grid = grid.reshape(1, gs, gs, -1).permute(0, 3, 1, 2)
            grid = F.interpolate(grid, size=(gh, gw), mode="bilinear")
            grid = grid.permute(0, 2, 3, 1).reshape(1, gh * gw, -1)
            h = h + torch.cat([tok, grid], dim=1)
        else:
            h = h + self.pos_embed
        taps = []
        for i, blk in enumerate(self.blocks):
            h = blk(h)
            if i in tcd.HOOKS[2:]:
                taps.append(h)
        return f4, f8, taps, (gh, gw)


class THybridDPT(nn.Module):
    """DPT hybrid assembly: taps 1-2 raw resnet maps, 3-4 readout
    reassembly (backbones/vit.py:120-151)."""

    def __init__(self):
        super().__init__()
        from test_convert_dpt import TFusion, act_postprocess
        pre = nn.Module()
        pre.model = THybridViT()
        pre.act_postprocess3 = act_postprocess(3)
        pre.act_postprocess4 = act_postprocess(4)
        self.pretrained = pre
        f = tcd.FEATURES
        scratch = nn.Module()
        for i, c in enumerate(tcd.REASSEMBLE):
            setattr(scratch, f"layer{i + 1}_rn",
                    nn.Conv2d(c, f, 3, 1, 1, bias=False))
        scratch.refinenet4 = TFusion(f, has_skip=False)
        scratch.refinenet3 = TFusion(f, has_skip=True)
        scratch.refinenet2 = TFusion(f, has_skip=True)
        scratch.refinenet1 = TFusion(f, has_skip=True)
        scratch.output_conv = nn.Sequential(
            nn.Conv2d(f, f // 2, 3, 1, 1),
            nn.Upsample(scale_factor=2, mode="bilinear",
                        align_corners=True),
            nn.Conv2d(f // 2, 32, 3, 1, 1),
            nn.ReLU(True),
            nn.Conv2d(32, 1, 1),
            nn.ReLU(True))
        self.scratch = scratch

    def forward(self, x, d):
        l1, l2, taps, (gh, gw) = self.pretrained.model.forward_features(x)

        def unflatten(t):
            return t.transpose(1, 2).unflatten(2, (gh, gw))

        layers = [l1, l2]
        for n, tap in zip((3, 4), taps):
            seq = getattr(self.pretrained, f"act_postprocess{n}")
            h = seq[0:2](tap)
            h = unflatten(h)
            layers.append(seq[3:](h))
        l1, l2, l3, l4 = layers
        r1 = self.scratch.layer1_rn(l1)
        r2 = self.scratch.layer2_rn(l2)
        r3 = self.scratch.layer3_rn(l3)
        r4 = self.scratch.layer4_rn(l4)
        p4 = self.scratch.refinenet4(r4, size=r3.shape[2:])
        p3 = self.scratch.refinenet3(p4, r3, size=r2.shape[2:])
        p2 = self.scratch.refinenet2(p3, r2, size=r1.shape[2:])
        p1 = self.scratch.refinenet1(p2, r1)
        out = self.scratch.output_conv(p1)
        scales = F.relu(1.0 + out)
        pred = d * scales
        pred = torch.clamp(pred, max=1.0 / 0.1)
        pred = torch.clamp(pred, min=1.0 / 255.0)
        return pred


def build_hybrid_twin(monkeypatch, seed=23):
    for k, v in HYBRID_DIMS.items():
        monkeypatch.setattr(tcd, k, v)
    torch.manual_seed(seed)
    model = THybridDPT().eval()
    with torch.no_grad():
        for p in model.parameters():
            p.normal_(0, 0.02)
    return model


@pytest.mark.slow
def test_hybrid_converter_end_to_end(rng, monkeypatch):
    """Full-dimension dpt_hybrid forward: converted weights reproduce the
    torch twin at net 192x192 (grid 12x12 - the 24x24 pretrained
    pos_embed is runtime-interpolated on both sides)."""
    model = build_hybrid_twin(monkeypatch)
    sd = {k: np.asarray(v.detach().numpy())
          for k, v in model.state_dict().items()}

    from riders_tpu.core.config import zju_config
    from riders_tpu.models.factory import build_sml_model
    cfg_r = zju_config()
    cfg_r = cfg_r.replace(sml=dataclasses.replace(
        cfg_r.sml, model_type="dpt-hybrid", net_shape=(192, 192)))
    rmodel = build_sml_model(cfg_r)
    cfg = rmodel.config
    assert cfg.backbone == "vit_hybrid" and cfg.pretrained_grid == 24
    variables = convert.convert_dpt_state_dict(sd, cfg)

    H, W = cfg.net_shape
    x = rng.standard_normal((1, H, W, 3)).astype(np.float32)
    d = (rng.random((1, H, W, 1)) * 5).astype(np.float32)
    model_j = DPTScaleMapLearner(config=cfg)
    template = jax.jit(model_j.init)(jax.random.PRNGKey(0),
                                     jnp.asarray(x), jnp.asarray(d))
    problems = convert.check_tree_matches(variables["params"],
                                          template["params"])
    assert not problems, problems[:10]

    with torch.no_grad():
        ref = model(torch.from_numpy(x).permute(0, 3, 1, 2),
                    torch.from_numpy(d).permute(0, 3, 1, 2))
    pred, _ = jax.jit(model_j.apply)(variables, jnp.asarray(x),
                                     jnp.asarray(d))
    np.testing.assert_allclose(np.asarray(pred)[..., 0],
                               ref.numpy()[:, 0], rtol=1e-4, atol=1e-4)
