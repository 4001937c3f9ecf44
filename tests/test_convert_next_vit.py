"""Next-ViT DPT converter tests against a torch twin.

The twin reproduces the Next-ViT classification trunk's checkpoint key
layout as the reference instantiates it (backbones/next_vit.py:32-39:
`timm.create_model("nextvit_large")` resolved through the vendored
`classification.nextvit` registration; forward hooks on the flat
`features` list at the stage-final blocks) plus the standard 4-level DPT
assembly (dpt_depth.py:59,66-69,104-110: in_features [96,256,512,1024],
no readout, features=256 head).  Converted (BN-folded) weights must
produce near-fp32-identical predictions.

Twin structure per the Next-ViT architecture (Li et al. 2022): ConvBNReLU
stem, NCB (PatchEmbed -> +MHCA -> BN -> +MLP) and NTB (PatchEmbed ->
+E-MHSA on a mix_block_ratio channel slice -> 1x1-project -> +MHCA ->
concat -> BN -> +MLP) blocks, E-MHSA's AvgPool1d(sr^2) over the
row-major token sequence (remainder truncated - exercised here via a
48x48 input whose 144-token stage-0 grid is not a multiple of sr^2=64).
"""

import dataclasses

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from riders_tpu.models import convert
from riders_tpu.models.dpt import DPTConfig, DPTScaleMapLearner
from riders_tpu.models.next_vit import (NextViTConfig, _make_divisible,
                                        stage_plan)

DEPTHS = (1, 2, 5, 2)
CHANS = ((32,), (48, 128), (64, 64, 64, 64, 128), (96, 128))
STEM = (16, 8, 16)
HEAD_DIM = 16
SR = (8, 4, 2, 1)
HOOKS = (0, 2, 7, 9)
FEATURES = 16
IMG = 48     # /4 grid 12x12 = 144 tokens: NOT a multiple of sr^2 = 64


def tiny_nv_config() -> NextViTConfig:
    return NextViTConfig(depths=DEPTHS, stage_chans=CHANS, stem_chs=STEM,
                         head_dim=HEAD_DIM, sr_ratios=SR, hooks=HOOKS)


def tiny_config() -> DPTConfig:
    return DPTConfig(
        net_shape=(IMG, IMG), backbone="next_vit",
        next_vit=tiny_nv_config(),
        hooks=HOOKS, reassemble_channels=(32, 128, 128, 128),
        features=FEATURES, head_features_2=4)


class CBR(nn.Module):
    """Next-ViT ConvBNReLU."""

    def __init__(self, i, o, stride=1, groups=1):
        super().__init__()
        self.conv = nn.Conv2d(i, o, 3, stride, 1, groups=groups,
                              bias=False)
        self.norm = nn.BatchNorm2d(o)
        self.act = nn.ReLU(True)

    def forward(self, x):
        return self.act(self.norm(self.conv(x)))


class TPatchEmbed(nn.Module):
    def __init__(self, i, o, stride=1):
        super().__init__()
        if stride == 2:
            self.avgpool = nn.AvgPool2d((2, 2), stride=2, ceil_mode=True,
                                        count_include_pad=False)
            self.conv = nn.Conv2d(i, o, 1, 1, bias=False)
            self.norm = nn.BatchNorm2d(o)
        elif i != o:
            self.avgpool = nn.Identity()
            self.conv = nn.Conv2d(i, o, 1, 1, bias=False)
            self.norm = nn.BatchNorm2d(o)
        else:
            self.avgpool = nn.Identity()
            self.conv = nn.Identity()
            self.norm = nn.Identity()

    def forward(self, x):
        return self.norm(self.conv(self.avgpool(x)))


class TMHCA(nn.Module):
    def __init__(self, o, head_dim):
        super().__init__()
        self.group_conv3x3 = nn.Conv2d(o, o, 3, 1, 1,
                                       groups=o // head_dim, bias=False)
        self.norm = nn.BatchNorm2d(o)
        self.act = nn.ReLU(True)
        self.projection = nn.Conv2d(o, o, 1, bias=False)

    def forward(self, x):
        return self.projection(self.act(self.norm(self.group_conv3x3(x))))


class TMlp(nn.Module):
    def __init__(self, dim, ratio):
        super().__init__()
        hidden = _make_divisible(dim * ratio)
        self.conv1 = nn.Conv2d(dim, hidden, 1, bias=True)
        self.act = nn.ReLU(True)
        self.conv2 = nn.Conv2d(hidden, dim, 1, bias=True)

    def forward(self, x):
        return self.conv2(self.act(self.conv1(x)))


class TNCB(nn.Module):
    def __init__(self, i, o, stride, head_dim, mlp_ratio=3):
        super().__init__()
        self.patch_embed = TPatchEmbed(i, o, stride)
        self.mhca = TMHCA(o, head_dim)
        self.norm = nn.BatchNorm2d(o)
        self.mlp = TMlp(o, mlp_ratio)

    def forward(self, x):
        x = self.patch_embed(x)
        x = x + self.mhca(x)
        return x + self.mlp(self.norm(x))


class TEMHSA(nn.Module):
    def __init__(self, dim, head_dim, sr_ratio):
        super().__init__()
        self.heads = dim // head_dim
        self.head_dim = head_dim
        self.q = nn.Linear(dim, dim)
        self.k = nn.Linear(dim, dim)
        self.v = nn.Linear(dim, dim)
        self.proj = nn.Linear(dim, dim)
        self.sr_ratio = sr_ratio
        if sr_ratio > 1:
            self.sr = nn.AvgPool1d(sr_ratio ** 2, stride=sr_ratio ** 2)
            self.norm = nn.BatchNorm1d(dim)

    def forward(self, x):                        # (B, N, C)
        B, N, C = x.shape
        q = self.q(x).reshape(B, N, self.heads, self.head_dim
                              ).permute(0, 2, 1, 3)
        kv = x
        if self.sr_ratio > 1:
            kv = self.sr(x.transpose(1, 2))      # (B, C, M), truncates
            kv = self.norm(kv).transpose(1, 2)
        M = kv.shape[1]
        k = self.k(kv).reshape(B, M, self.heads, self.head_dim
                               ).permute(0, 2, 1, 3)
        v = self.v(kv).reshape(B, M, self.heads, self.head_dim
                               ).permute(0, 2, 1, 3)
        attn = (q @ k.transpose(-2, -1)) * self.head_dim ** -0.5
        attn = attn.softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(out)


class TNTB(nn.Module):
    def __init__(self, i, o, stride, sr_ratio, head_dim,
                 mix_block_ratio=0.75, mlp_ratio=2):
        super().__init__()
        mhsa_ch = _make_divisible(int(o * mix_block_ratio))
        mhca_ch = o - mhsa_ch
        self.patch_embed = TPatchEmbed(i, mhsa_ch, stride)
        self.norm1 = nn.BatchNorm2d(mhsa_ch)
        self.e_mhsa = TEMHSA(mhsa_ch, head_dim, sr_ratio)
        self.projection = TPatchEmbed(mhsa_ch, mhca_ch, 1)
        self.mhca = TMHCA(mhca_ch, head_dim)
        self.norm2 = nn.BatchNorm2d(o)
        self.mlp = TMlp(o, mlp_ratio)

    def forward(self, x):
        x = self.patch_embed(x)
        B, C, H, W = x.shape
        out = self.norm1(x).flatten(2).transpose(1, 2)
        out = self.e_mhsa(out)
        x = x + out.transpose(1, 2).reshape(B, C, H, W)
        out = self.projection(x)
        out = out + self.mhca(out)
        x = torch.cat([x, out], dim=1)
        return x + self.mlp(self.norm2(x))


class TNextViT(nn.Module):
    """Next-ViT trunk exposing the checkpoint key layout (stem.N.*,
    features.N.*) and the hooked stage-final feature maps."""

    def __init__(self, cfg: NextViTConfig):
        super().__init__()
        s0, s1, s2 = cfg.stem_chs
        self.stem = nn.Sequential(CBR(3, s0, 2), CBR(s0, s1, 1),
                                  CBR(s1, s2, 1), CBR(s2, s2, 2))
        types, chans = stage_plan(cfg)
        feats, in_ch = [], s2
        for si in range(4):
            for bi, (bt, c) in enumerate(zip(types[si], chans[si])):
                stride = cfg.strides[si] if bi == 0 else 1
                if bt == "ncb":
                    feats.append(TNCB(in_ch, c, stride, cfg.head_dim,
                                      cfg.mlp_ratio_ncb))
                else:
                    feats.append(TNTB(in_ch, c, stride, cfg.sr_ratios[si],
                                      cfg.head_dim, cfg.mix_block_ratio,
                                      cfg.mlp_ratio_ntb))
                in_ch = c
        self.features = nn.Sequential(*feats)
        self.hooks = cfg.hooks

    def forward_features(self, x):
        h = self.stem(x)
        taps = []
        for i, blk in enumerate(self.features):
            h = blk(h)
            if i in self.hooks:
                taps.append(h)
        return taps


class TDPTNextViT(nn.Module):
    """DPT next_vit assembly (dpt_depth.py:59,66-69,104-110,169-177)."""

    def __init__(self):
        super().__init__()
        from test_convert_dpt import TFusion
        pre = nn.Module()
        pre.model = TNextViT(tiny_nv_config())
        self.pretrained = pre
        f = FEATURES
        scratch = nn.Module()
        for i, c in enumerate((32, 128, 128, 128)):
            setattr(scratch, f"layer{i + 1}_rn",
                    nn.Conv2d(c, f, 3, 1, 1, bias=False))
        scratch.refinenet4 = TFusion(f, has_skip=False)
        scratch.refinenet3 = TFusion(f, has_skip=True)
        scratch.refinenet2 = TFusion(f, has_skip=True)
        scratch.refinenet1 = TFusion(f, has_skip=True)
        hf2 = 4
        scratch.output_conv = nn.Sequential(
            nn.Conv2d(f, f // 2, 3, 1, 1),
            nn.Upsample(scale_factor=2, mode="bilinear",
                        align_corners=True),
            nn.Conv2d(f // 2, hf2, 3, 1, 1),
            nn.ReLU(True),
            nn.Conv2d(hf2, 1, 1),
            nn.ReLU(True))
        self.scratch = scratch

    def forward(self, x, d):
        l1, l2, l3, l4 = self.pretrained.model.forward_features(x)
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


@pytest.mark.slow
def test_next_vit_converter_end_to_end(rng):
    torch.manual_seed(6)
    tmodel = TDPTNextViT().eval()
    with torch.no_grad():
        for p in tmodel.parameters():
            p.normal_(0, 0.05)
        for m in tmodel.modules():
            if isinstance(m, (nn.BatchNorm1d, nn.BatchNorm2d)):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 2.0)

    sd = {k: np.asarray(v.numpy())
          for k, v in tmodel.state_dict().items()}
    cfg = tiny_config()
    variables = convert.convert_next_vit_state_dict(sd, cfg)

    model = DPTScaleMapLearner(config=cfg)
    x = rng.standard_normal((2, IMG, IMG, 3)).astype(np.float32)
    d = (rng.random((2, IMG, IMG, 1)) * 5).astype(np.float32)

    template = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(x),
                                   jnp.asarray(d))
    problems = convert.check_tree_matches(variables["params"],
                                          template["params"])
    assert not problems, problems[:10]

    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2),
                     torch.from_numpy(d).permute(0, 3, 1, 2))
    pred, _ = jax.jit(model.apply)(variables, jnp.asarray(x),
                                   jnp.asarray(d))
    np.testing.assert_allclose(np.asarray(pred)[..., 0],
                               ref.numpy()[:, 0], rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_next_vit_full_size_key_map():
    """Full-size nextvit_large (depths 3/4/30/3, channels to 1024, hooks
    2/6/36/39): the converter consumes a synthetic state dict with the
    real key names/shapes and produces a tree matching the model template
    (no forward - 45M params on CPU; the tiny twin covers numerics)."""
    from riders_tpu.core.config import zju_config
    from riders_tpu.models.factory import build_sml_model

    cfg_r = zju_config()
    cfg_r = cfg_r.replace(sml=dataclasses.replace(
        cfg_r.sml, model_type="dpt-next-vit-large", net_shape=(96, 96)))
    model = build_sml_model(cfg_r)
    cfg = model.config
    assert cfg.backbone == "next_vit" and cfg.features == 256
    assert tuple(cfg.hooks) == (2, 6, 36, 39)
    assert tuple(cfg.reassemble_channels) == (96, 256, 512, 1024)

    torch.manual_seed(7)
    tmodel = TDPTNextViT.__new__(TDPTNextViT)
    nn.Module.__init__(tmodel)
    pre = nn.Module()
    pre.model = TNextViT(cfg.next_vit or NextViTConfig())
    tmodel.pretrained = pre
    f = cfg.features
    scratch = nn.Module()
    for i, c in enumerate(cfg.reassemble_channels):
        setattr(scratch, f"layer{i + 1}_rn",
                nn.Conv2d(c, f, 3, 1, 1, bias=False))
    from test_convert_dpt import TFusion
    scratch.refinenet4 = TFusion(f, has_skip=False)
    scratch.refinenet3 = TFusion(f, has_skip=True)
    scratch.refinenet2 = TFusion(f, has_skip=True)
    scratch.refinenet1 = TFusion(f, has_skip=True)
    scratch.output_conv = nn.Sequential(
        nn.Conv2d(f, f // 2, 3, 1, 1),
        nn.Upsample(scale_factor=2, mode="bilinear", align_corners=True),
        nn.Conv2d(f // 2, cfg.head_features_2, 3, 1, 1),
        nn.ReLU(True),
        nn.Conv2d(cfg.head_features_2, 1, 1),
        nn.ReLU(True))
    tmodel.scratch = scratch

    sd = {k: np.asarray(v.detach().numpy())
          for k, v in tmodel.state_dict().items()}
    variables = convert.convert_next_vit_state_dict(sd, cfg)

    h, w = cfg.net_shape
    template = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, h, w, 3)), jnp.ones((1, h, w, 1)))
    problems = convert.check_tree_matches(variables["params"],
                                          template["params"])
    assert not problems, problems[:10]
