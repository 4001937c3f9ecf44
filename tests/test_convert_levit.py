"""LeViT-384 DPT converter tests against a torch twin.

The twin reproduces the timm `levit_384` checkpoint key layout the
reference instantiates (modules/midas/backbones/levit.py:1-196: hybrid
conv stem, Residual attention/MLP pairs with learned offset biases,
AttentionSubsample between stages - all LinearNorm/ConvNorm `.c`+`.bn`
pairs) plus the DPT levit assembly (dpt_depth.py:60,96-99,131-144:
3 hooks, no readout, stem_b4_transpose after refinenet1, narrow head).
Converted (BN-folded) weights must produce near-fp32-identical
predictions.
"""

import dataclasses
import itertools

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from riders_tpu.models import convert
from riders_tpu.models.dpt import DPTConfig, DPTScaleMapLearner
from riders_tpu.models.levit import LeViTConfig

EMBED = (16, 24, 32)
KEY_DIM = 4
HEADS = (2, 3, 4)
DEPTHS = (2, 2, 2)
ATTN_RATIO = 2
DOWN_RATIO = 4
HOOKS = (1, 7, 13)
FEATURES = 16
HF2 = 4                        # head_features_2 (8 at full size)
IMG = 64                       # stem /16 -> grid 4 -> 2 -> 1


def tiny_config() -> DPTConfig:
    return DPTConfig(
        net_shape=(IMG, IMG), backbone="levit",
        levit=LeViTConfig(embed_dims=EMBED, key_dim=KEY_DIM,
                          num_heads=HEADS, depths=DEPTHS,
                          attn_ratio=ATTN_RATIO,
                          down_attn_ratio=DOWN_RATIO, hooks=HOOKS),
        hooks=HOOKS, reassemble_channels=EMBED, features=FEATURES,
        head_features_1=FEATURES // 4, head_features_2=4)


class LN(nn.Module):
    """timm levit LinearNorm: Linear (no bias) + BatchNorm1d over
    flattened tokens."""

    def __init__(self, i, o):
        super().__init__()
        self.c = nn.Linear(i, o, bias=False)
        self.bn = nn.BatchNorm1d(o)

    def forward(self, x):
        x = self.c(x)
        return self.bn(x.flatten(0, 1)).reshape_as(x)


class CN(nn.Module):
    """timm levit ConvNorm."""

    def __init__(self, i, o, stride=2):
        super().__init__()
        self.c = nn.Conv2d(i, o, 3, stride, 1, bias=False)
        self.bn = nn.BatchNorm2d(o)

    def forward(self, x):
        return self.bn(self.c(x))


class CTN(nn.Module):
    """ConvTransposeNorm (backbones/levit.py:55-84)."""

    def __init__(self, i, o):
        super().__init__()
        self.c = nn.ConvTranspose2d(i, o, 3, 2, 1, bias=False)
        self.bn = nn.BatchNorm2d(o)

    def forward(self, x):
        return self.bn(self.c(x))


def _bias_idx(points_q, points_kv, stride=1):
    offsets, idxs = {}, []
    for p1 in points_q:
        for p2 in points_kv:
            off = (abs(p1[0] * stride - p2[0]), abs(p1[1] * stride - p2[1]))
            offsets.setdefault(off, len(offsets))
            idxs.append(offsets[off])
    return (torch.tensor(idxs).view(len(points_q), len(points_kv)),
            len(offsets))


def _points(r):
    return list(itertools.product(range(r), range(r)))


class TAttn(nn.Module):
    def __init__(self, dim, heads, res):
        super().__init__()
        kd, vd = KEY_DIM, KEY_DIM * ATTN_RATIO
        self.h, self.kd, self.vd = heads, kd, vd
        self.qkv = LN(dim, heads * (2 * kd + vd))
        self.proj = nn.Sequential(nn.Hardswish(), LN(heads * vd, dim))
        idx, n = _bias_idx(_points(res), _points(res))
        self.attention_biases = nn.Parameter(torch.zeros(heads, n))
        self.register_buffer("bias_idx", idx, persistent=False)

    def forward(self, x):
        B, N, _ = x.shape
        q, k, v = self.qkv(x).view(B, N, self.h, -1).split(
            [self.kd, self.kd, self.vd], dim=3)
        q, k, v = (t.permute(0, 2, 1, 3) for t in (q, k, v))
        attn = q @ k.transpose(-2, -1) * self.kd ** -0.5
        attn = attn + self.attention_biases[:, self.bias_idx]
        attn = attn.softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(B, N, self.h * self.vd)
        return self.proj(out)


class TSub(nn.Module):
    """AttentionSubsample: q from the stride-2 grid, kv from the full."""

    def __init__(self, i_dim, o_dim, res):
        super().__init__()
        kd = KEY_DIM
        heads = i_dim // kd
        vd = kd * DOWN_RATIO
        self.h, self.kd, self.vd, self.res = heads, kd, vd, res
        self.res_ = (res - 1) // 2 + 1
        self.kv = LN(i_dim, heads * (kd + vd))
        self.q = nn.Sequential(nn.Identity(), LN(i_dim, heads * kd))
        self.proj = nn.Sequential(nn.Hardswish(), LN(heads * vd, o_dim))
        idx, n = _bias_idx(_points(self.res_), _points(res), stride=2)
        self.attention_biases = nn.Parameter(torch.zeros(heads, n))
        self.register_buffer("bias_idx", idx, persistent=False)

    def forward(self, x):
        B, N, C = x.shape
        k, v = self.kv(x).view(B, N, self.h, -1).split(
            [self.kd, self.vd], dim=3)
        k, v = (t.permute(0, 2, 1, 3) for t in (k, v))
        sub = x.view(B, self.res, self.res, C)[:, ::2, ::2].reshape(B, -1, C)
        q = self.q(sub).view(B, -1, self.h, self.kd).permute(0, 2, 1, 3)
        attn = q @ k.transpose(-2, -1) * self.kd ** -0.5
        attn = attn + self.attention_biases[:, self.bias_idx]
        attn = attn.softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(B, -1, self.h * self.vd)
        return self.proj(out)


class TResidual(nn.Module):
    def __init__(self, m):
        super().__init__()
        self.m = m

    def forward(self, x):
        return x + self.m(x)


def _mlp(dim, ratio=2):
    return TResidual(nn.Sequential(LN(dim, dim * ratio), nn.Hardswish(),
                                   LN(dim * ratio, dim)))


class TLevit(nn.Module):
    """timm levit_384-style trunk exposing the checkpoint key layout."""

    def __init__(self):
        super().__init__()
        e0 = EMBED[0]
        self.patch_embed = nn.Sequential(
            CN(3, e0 // 8), nn.Hardswish(), CN(e0 // 8, e0 // 4),
            nn.Hardswish(), CN(e0 // 4, e0 // 2), nn.Hardswish(),
            CN(e0 // 2, e0))
        blocks = []
        res = IMG // 16
        for si in range(3):
            dim = EMBED[si]
            for _ in range(DEPTHS[si]):
                blocks.append(TResidual(TAttn(dim, HEADS[si], res)))
                blocks.append(_mlp(dim))
            if si < 2:
                blocks.append(TSub(dim, EMBED[si + 1], res))
                res = (res - 1) // 2 + 1
                blocks.append(_mlp(EMBED[si + 1]))
        self.blocks = nn.Sequential(*blocks)

    def forward_features(self, x):
        h = self.patch_embed(x)
        B, C, gh, gw = h.shape
        h = h.flatten(2).transpose(1, 2)
        taps = []
        res = gh
        for i, blk in enumerate(self.blocks):
            h = blk(h)
            if isinstance(blk, TSub):
                res = (res - 1) // 2 + 1
            if i in HOOKS:
                taps.append(h.transpose(1, 2).unflatten(2, (res, res)))
        return taps


class TDPTLevit(nn.Module):
    """DPT levit assembly (dpt_depth.py:60,96-99,131-144)."""

    def __init__(self):
        super().__init__()
        from test_convert_dpt import TFusion
        pre = nn.Module()
        pre.model = TLevit()
        self.pretrained = pre
        f = FEATURES
        scratch = nn.Module()
        for i, c in enumerate(EMBED):
            setattr(scratch, f"layer{i + 1}_rn",
                    nn.Conv2d(c, f, 3, 1, 1, bias=False))
        scratch.refinenet3 = TFusion(f, has_skip=False)
        scratch.refinenet2 = TFusion(f, has_skip=True)
        scratch.refinenet1 = TFusion(f, has_skip=True)
        scratch.stem_transpose = nn.Sequential(
            CTN(f, f // 2), nn.Hardswish(), CTN(f // 2, f // 4),
            nn.Hardswish())
        hf1, hf2 = f // 4, HF2
        scratch.output_conv = nn.Sequential(
            nn.Conv2d(hf1, hf1 // 2, 3, 1, 1),
            nn.Upsample(scale_factor=2, mode="bilinear",
                        align_corners=True),
            nn.Conv2d(hf1 // 2, hf2, 3, 1, 1),
            nn.ReLU(True),
            nn.Conv2d(hf2, 1, 1),
            nn.ReLU(True))
        self.scratch = scratch

    def forward(self, x, d):
        l1, l2, l3 = self.pretrained.model.forward_features(x)
        r1 = self.scratch.layer1_rn(l1)
        r2 = self.scratch.layer2_rn(l2)
        r3 = self.scratch.layer3_rn(l3)
        p3 = self.scratch.refinenet3(r3, size=r2.shape[2:])
        p2 = self.scratch.refinenet2(p3, r2, size=r1.shape[2:])
        p1 = self.scratch.refinenet1(p2, r1)
        p1 = self.scratch.stem_transpose(p1)
        out = self.scratch.output_conv(p1)
        # the transpose stem lands short of the net shape (2i-1 per
        # ConvTranspose2d(3,2,1)); align to the prior exactly as the
        # riders model does (see models/dpt.py levit head note)
        if out.shape[2:] != d.shape[2:]:
            out = F.interpolate(out, size=d.shape[2:], mode="bilinear",
                                align_corners=True)
        scales = F.relu(1.0 + out)
        pred = d * scales
        pred = torch.clamp(pred, max=1.0 / 0.1)
        pred = torch.clamp(pred, min=1.0 / 255.0)
        return pred


@pytest.mark.slow
def test_levit_converter_end_to_end(rng):
    torch.manual_seed(4)
    tmodel = TDPTLevit().eval()
    with torch.no_grad():
        for p in tmodel.parameters():
            p.normal_(0, 0.05)
        for m in tmodel.modules():
            if isinstance(m, (nn.BatchNorm1d, nn.BatchNorm2d)):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 2.0)

    sd = {k: np.asarray(v.numpy()) for k, v in tmodel.state_dict().items()
          if "bias_idx" not in k}
    cfg = tiny_config()
    variables = convert.convert_levit_state_dict(sd, cfg)

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
def test_levit_full_size_key_map():
    """Full-size levit_384 (embed 384/512/768, depths 4/4/4, hooks
    3/11/21): the converter consumes a synthetic state dict with the real
    key names/shapes and produces a tree that matches the model template
    at 224x224 exactly (the dpt_levit_224 protocol resolution,
    core/normalization.py)."""
    from riders_tpu.core.config import zju_config

    cfg_r = zju_config()
    cfg_r = cfg_r.replace(sml=dataclasses.replace(
        cfg_r.sml, model_type="dpt-levit-224", net_shape=(224, 224)))
    from riders_tpu.models.factory import build_sml_model
    model = build_sml_model(cfg_r)
    cfg = model.config
    assert cfg.backbone == "levit" and cfg.features == 256
    assert cfg.head_features_1 == 64 and cfg.head_features_2 == 8

    lcfg = cfg.levit
    torch.manual_seed(5)
    sd = {}

    def _bn_keys(prefix, o):
        for s in ("weight", "running_var"):
            sd[prefix + f".bn.{s}"] = np.ones(o, np.float32)
        for s in ("bias", "running_mean"):
            sd[prefix + f".bn.{s}"] = np.zeros(o, np.float32)

    def _ln_keys(prefix, i, o):
        sd[prefix + ".c.weight"] = np.zeros((o, i), np.float32)
        _bn_keys(prefix, o)

    p = "pretrained.model."
    chans = (3, 48, 96, 192, 384)
    for j, slot in enumerate((0, 2, 4, 6)):
        pre = p + f"patch_embed.{slot}"
        sd[pre + ".c.weight"] = np.zeros(
            (chans[j + 1], chans[j], 3, 3), np.float32)
        _bn_keys(pre, chans[j + 1])

    kd, ar, dr = lcfg.key_dim, lcfg.attn_ratio, lcfg.down_attn_ratio
    res = 14
    i = 0
    for si in range(3):
        dim = lcfg.embed_dims[si]
        h = lcfg.num_heads[si]
        n_off = res * res    # unique |dy|,|dx| pairs on a res x res grid
        for _ in range(lcfg.depths[si]):
            bp = p + f"blocks.{i}.m."
            _ln_keys(bp + "qkv", dim, h * (2 * kd + ar * kd))
            _ln_keys(bp + "proj.1", h * ar * kd, dim)
            sd[bp + "attention_biases"] = np.zeros((h, n_off), np.float32)
            i += 1
            bp = p + f"blocks.{i}.m."
            _ln_keys(bp + "0", dim, dim * 2)
            _ln_keys(bp + "2", dim * 2, dim)
            i += 1
        if si < 2:
            out_dim = lcfg.embed_dims[si + 1]
            sh = (res - 1) // 2 + 1
            # offsets between the sub grid and the full grid
            idx, n_off_s = _bias_idx(_points(sh), _points(res), stride=2)
            hs = dim // kd
            bp = p + f"blocks.{i}."
            _ln_keys(bp + "kv", dim, hs * (kd + dr * kd))
            _ln_keys(bp + "q.1", dim, hs * kd)
            _ln_keys(bp + "proj.1", hs * dr * kd, out_dim)
            sd[bp + "attention_biases"] = np.zeros((hs, n_off_s),
                                                   np.float32)
            i += 1
            bp = p + f"blocks.{i}.m."
            _ln_keys(bp + "0", out_dim, out_dim * 2)
            _ln_keys(bp + "2", out_dim * 2, out_dim)
            i += 1
            res = sh

    f = cfg.features
    for n, c in enumerate((384, 512, 768), start=1):
        sd[f"scratch.layer{n}_rn.weight"] = np.zeros((f, c, 3, 3),
                                                     np.float32)
    for n in (1, 2, 3):
        rn = f"scratch.refinenet{n}"
        sd[rn + ".out_conv.weight"] = np.zeros((f, f, 1, 1), np.float32)
        sd[rn + ".out_conv.bias"] = np.zeros(f, np.float32)
        units = ("resConfUnit2",) if n == 3 else ("resConfUnit1",
                                                  "resConfUnit2")
        for u in units:
            for cv in ("conv1", "conv2"):
                sd[f"{rn}.{u}.{cv}.weight"] = np.zeros((f, f, 3, 3),
                                                       np.float32)
                sd[f"{rn}.{u}.{cv}.bias"] = np.zeros(f, np.float32)
    for slot, ci, co in ((0, f, f // 2), (2, f // 2, f // 4)):
        pre = f"scratch.stem_transpose.{slot}"
        sd[pre + ".c.weight"] = np.zeros((ci, co, 3, 3), np.float32)
        _bn_keys(pre, co)
    hf1, hf2 = cfg.head_features_1, cfg.head_features_2
    sd["scratch.output_conv.0.weight"] = np.zeros((hf1 // 2, hf1, 3, 3),
                                                  np.float32)
    sd["scratch.output_conv.0.bias"] = np.zeros(hf1 // 2, np.float32)
    sd["scratch.output_conv.2.weight"] = np.zeros((hf2, hf1 // 2, 3, 3),
                                                  np.float32)
    sd["scratch.output_conv.2.bias"] = np.zeros(hf2, np.float32)
    sd["scratch.output_conv.4.weight"] = np.zeros((1, hf2, 1, 1),
                                                  np.float32)
    sd["scratch.output_conv.4.bias"] = np.zeros(1, np.float32)

    variables = convert.convert_levit_state_dict(sd, cfg)
    x = jnp.zeros((1, 224, 224, 3))
    d = jnp.ones((1, 224, 224, 1))
    template = jax.jit(model.init)(jax.random.PRNGKey(0), x, d)
    problems = convert.check_tree_matches(variables["params"],
                                          template["params"])
    assert not problems, problems[:10]


def test_levit_converter_rejects_grid_mismatch():
    """The checkpoint bias tables are grid-specific; converting for a
    net_shape implying a different token grid must fail loudly (a silent
    pass would misindex the table at apply time - clamped, not erroring)."""
    tmodel = TDPTLevit().eval()
    sd = {k: np.asarray(v.numpy()) for k, v in tmodel.state_dict().items()
          if "bias_idx" not in k}
    cfg = dataclasses.replace(tiny_config(), net_shape=(2 * IMG, 2 * IMG))
    with pytest.raises(ValueError, match="attention-bias offsets"):
        convert.convert_levit_state_dict(sd, cfg)
