"""Swin2 backbone converter test against a torch twin.

The twin reproduces timm 0.6.12 swin_transformer_v2.py at a shrunken
scale with the exact checkpoint key layout (fused qkv without bias +
separate q/v biases, per-head logit scales, cpb MLPs over the log-spaced
coordinate table, stage-end patch merging, cyclic-shift masks); converted
weights must produce near-fp32-identical stage taps, including a shifted
stage, a window==resolution stage and a window-clamped stage.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from riders_tpu.models import convert
from riders_tpu.models.swin2 import Swin2Config, SwinV2Backbone

EMBED = 8
DEPTHS = (2, 2, 2, 2)
HEADS = (2, 2, 2, 2)
WINDOW = 4
PRETRAINED = (2, 2, 2, 2)
IMG = 64   # grids 16, 8, 4, 2


def window_partition(x, ws):
    B, H, W, C = x.shape
    x = x.view(B, H // ws, ws, W // ws, ws, C)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)


def window_reverse(x, ws, H, W):
    B = x.shape[0] // (H // ws * W // ws)
    x = x.view(B, H // ws, W // ws, ws, ws, -1)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


class TAttn(nn.Module):
    def __init__(self, dim, heads, window, pretrained):
        super().__init__()
        self.heads = heads
        self.window = window
        self.qkv = nn.Linear(dim, 3 * dim, bias=False)
        self.q_bias = nn.Parameter(torch.zeros(dim))
        self.v_bias = nn.Parameter(torch.zeros(dim))
        self.logit_scale = nn.Parameter(
            torch.log(10 * torch.ones(heads, 1, 1)))
        self.cpb_mlp = nn.Sequential(nn.Linear(2, 512, bias=True),
                                     nn.ReLU(inplace=True),
                                     nn.Linear(512, heads, bias=False))
        self.proj = nn.Linear(dim, dim)

        r = torch.arange(-(window - 1), window, dtype=torch.float32)
        table = torch.stack(torch.meshgrid(r, r, indexing="ij"), -1)
        table = table / (pretrained - 1) * 8
        table = (torch.sign(table) * torch.log2(torch.abs(table) + 1.0)
                 / math.log2(8))
        self.register_buffer("table", table.view(-1, 2))

        coords = torch.stack(torch.meshgrid(
            torch.arange(window), torch.arange(window), indexing="ij"))
        flat = torch.flatten(coords, 1)
        rel = (flat[:, :, None] - flat[:, None, :]).permute(1, 2, 0)
        rel = rel.contiguous()
        rel[:, :, 0] += window - 1
        rel[:, :, 1] += window - 1
        rel[:, :, 0] *= 2 * window - 1
        self.register_buffer("rel_index", rel.sum(-1))

    def forward(self, x, mask=None):
        Bw, N, C = x.shape
        qkv_bias = torch.cat((self.q_bias,
                              torch.zeros_like(self.v_bias), self.v_bias))
        qkv = F.linear(x, self.qkv.weight, qkv_bias)
        qkv = qkv.reshape(Bw, N, 3, self.heads, -1).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        attn = F.normalize(q, dim=-1) @ F.normalize(k, dim=-1).transpose(
            -2, -1)
        scale = torch.clamp(self.logit_scale,
                            max=math.log(1.0 / 0.01)).exp()
        attn = attn * scale
        bias = self.cpb_mlp(self.table)[self.rel_index.view(-1)].view(
            N, N, self.heads).permute(2, 0, 1)
        attn = attn + 16 * torch.sigmoid(bias).unsqueeze(0)
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.view(Bw // nW, nW, self.heads, N, N) + \
                mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(-1, self.heads, N, N)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(Bw, N, C)
        return self.proj(x)


class TBlock(nn.Module):
    def __init__(self, dim, heads, resolution, window, shift, pretrained):
        super().__init__()
        self.resolution = resolution
        self.window = window
        self.shift = shift
        self.norm1 = nn.LayerNorm(dim)
        self.attn = TAttn(dim, heads, window, pretrained)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = nn.Sequential()
        self.mlp.fc1 = nn.Linear(dim, 4 * dim)
        self.mlp.fc2 = nn.Linear(4 * dim, dim)

        if shift > 0:
            H, W = resolution
            img = torch.zeros(1, H, W, 1)
            cnt = 0
            for hs in (slice(0, -window), slice(-window, -shift),
                       slice(-shift, None)):
                for ws in (slice(0, -window), slice(-window, -shift),
                           slice(-shift, None)):
                    img[:, hs, ws] = cnt
                    cnt += 1
            wins = window_partition(img, window).view(-1, window * window)
            diff = wins.unsqueeze(1) - wins.unsqueeze(2)
            self.register_buffer(
                "mask", torch.where(diff == 0, 0.0, -100.0))
        else:
            self.mask = None

    def forward(self, x):
        H, W = self.resolution
        B, L, C = x.shape
        h = x.view(B, H, W, C)
        if self.shift > 0:
            h = torch.roll(h, (-self.shift, -self.shift), dims=(1, 2))
        wins = window_partition(h, self.window)
        wins = self.attn(wins, self.mask)
        h = window_reverse(wins, self.window, H, W)
        if self.shift > 0:
            h = torch.roll(h, (self.shift, self.shift), dims=(1, 2))
        x = x + self.norm1(h.view(B, L, C))
        return x + self.norm2(self.mlp.fc2(F.gelu(self.mlp.fc1(x))))


class TMerge(nn.Module):
    def __init__(self, dim, resolution):
        super().__init__()
        self.resolution = resolution
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)
        self.norm = nn.LayerNorm(2 * dim)

    def forward(self, x):
        H, W = self.resolution
        B, L, C = x.shape
        h = x.view(B, H, W, C)
        parts = [h[:, 0::2, 0::2], h[:, 1::2, 0::2],
                 h[:, 0::2, 1::2], h[:, 1::2, 1::2]]
        h = torch.cat(parts, -1).view(B, L // 4, 4 * C)
        return self.norm(self.reduction(h))


class TSwin2(nn.Module):
    def __init__(self):
        super().__init__()
        pe = nn.Module()
        pe.proj = nn.Conv2d(3, EMBED, 4, 4)
        pe.norm = nn.LayerNorm(EMBED)
        self.patch_embed = pe
        self.layers = nn.ModuleList()
        res = (IMG // 4, IMG // 4)
        for si, depth in enumerate(DEPTHS):
            dim = EMBED * 2 ** si
            window = min(WINDOW, min(res))
            stage = nn.Module()
            stage.blocks = nn.ModuleList([
                TBlock(dim, HEADS[si], res, window,
                       window // 2 if (bi % 2 == 1 and min(res) > window)
                       else 0, PRETRAINED[si])
                for bi in range(depth)])
            if si < len(DEPTHS) - 1:
                stage.downsample = TMerge(dim, res)
                res = (res[0] // 2, res[1] // 2)
            self.layers.append(stage)

    def forward(self, x):
        h = self.patch_embed.proj(x)
        B, C, gh, gw = h.shape
        h = h.flatten(2).transpose(1, 2)
        h = self.patch_embed.norm(h)
        taps = []
        res = (gh, gw)
        for si, stage in enumerate(self.layers):
            for blk in stage.blocks:
                h = blk(h)
            taps.append(h.view(B, res[0], res[1], -1))
            if hasattr(stage, "downsample"):
                h = stage.downsample(h)
                res = (res[0] // 2, res[1] // 2)
        return taps


@pytest.mark.slow
def test_swin2_converter_end_to_end(rng):
    torch.manual_seed(2)
    tmodel = TSwin2().eval()
    with torch.no_grad():
        for name, p in tmodel.named_parameters():
            if "logit_scale" not in name:
                p.normal_(0, 0.05)

    sd = {"pretrained.model." + k: np.asarray(v.numpy())
          for k, v in tmodel.state_dict().items()
          if "table" not in k and "rel_index" not in k and "mask" not in k}
    params = convert._convert_swin2_backbone(sd, "pretrained.model.")

    cfg = Swin2Config(embed_dim=EMBED, depths=DEPTHS, num_heads=HEADS,
                      window_size=WINDOW, pretrained_window_sizes=PRETRAINED)
    model = SwinV2Backbone(config=cfg)
    x = rng.standard_normal((2, IMG, IMG, 3)).astype(np.float32)

    template = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(x))
    problems = convert.check_tree_matches(params, template["params"])
    assert not problems, problems[:10]

    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    got = jax.jit(model.apply)({"params": params}, jnp.asarray(x))
    assert len(got) == len(ref) == 4
    for i, (g, r) in enumerate(zip(got, ref)):
        np.testing.assert_allclose(
            np.asarray(g), r.numpy(), rtol=2e-4, atol=2e-4,
            err_msg=f"stage {i}")


def test_dpt_swin2_full_size_key_map():
    """Full-size swin2l24_384 DPT: the converter consumes a synthetic
    timm-keyed state dict and matches the DPTScaleMapLearner template
    (shapes only, via eval_shape)."""
    from riders_tpu.models.dpt import DPTConfig, DPTScaleMapLearner

    cfg = DPTConfig(backbone="swin2", net_shape=(384, 384))
    sw = Swin2Config()
    sd = {}
    p = "pretrained.model."
    E = sw.embed_dim
    sd[p + "patch_embed.proj.weight"] = np.zeros((E, 3, 4, 4), np.float32)
    sd[p + "patch_embed.proj.bias"] = np.zeros(E, np.float32)
    sd[p + "patch_embed.norm.weight"] = np.zeros(E, np.float32)
    sd[p + "patch_embed.norm.bias"] = np.zeros(E, np.float32)
    res = 96
    for si, depth in enumerate(sw.depths):
        dim = E * 2 ** si
        window = min(sw.window_size, res)
        nh = sw.num_heads[si]
        for bi in range(depth):
            b = p + f"layers.{si}.blocks.{bi}."
            for ln in ("norm1", "norm2"):
                sd[b + ln + ".weight"] = np.zeros(dim, np.float32)
                sd[b + ln + ".bias"] = np.zeros(dim, np.float32)
            sd[b + "attn.qkv.weight"] = np.zeros((3 * dim, dim), np.float32)
            sd[b + "attn.q_bias"] = np.zeros(dim, np.float32)
            sd[b + "attn.v_bias"] = np.zeros(dim, np.float32)
            sd[b + "attn.logit_scale"] = np.zeros((nh, 1, 1), np.float32)
            sd[b + "attn.cpb_mlp.0.weight"] = np.zeros((512, 2), np.float32)
            sd[b + "attn.cpb_mlp.0.bias"] = np.zeros(512, np.float32)
            sd[b + "attn.cpb_mlp.2.weight"] = np.zeros((nh, 512), np.float32)
            sd[b + "attn.proj.weight"] = np.zeros((dim, dim), np.float32)
            sd[b + "attn.proj.bias"] = np.zeros(dim, np.float32)
            sd[b + "mlp.fc1.weight"] = np.zeros((4 * dim, dim), np.float32)
            sd[b + "mlp.fc1.bias"] = np.zeros(4 * dim, np.float32)
            sd[b + "mlp.fc2.weight"] = np.zeros((dim, 4 * dim), np.float32)
            sd[b + "mlp.fc2.bias"] = np.zeros(dim, np.float32)
        if si < len(sw.depths) - 1:
            sd[p + f"layers.{si}.downsample.reduction.weight"] = np.zeros(
                (2 * dim, 4 * dim), np.float32)
            sd[p + f"layers.{si}.downsample.norm.weight"] = np.zeros(
                2 * dim, np.float32)
            sd[p + f"layers.{si}.downsample.norm.bias"] = np.zeros(
                2 * dim, np.float32)
            res //= 2
    f = cfg.features
    chans = [E, 2 * E, 4 * E, 8 * E]
    for n, c in enumerate(chans, start=1):
        sd[f"scratch.layer{n}_rn.weight"] = np.zeros((f, c, 3, 3),
                                                     np.float32)
    for n in (1, 2, 3, 4):
        rn = f"scratch.refinenet{n}"
        units = (("resConfUnit1", "resConfUnit2") if n != 4
                 else ("resConfUnit2",))
        for u in units:
            for cv in ("conv1", "conv2"):
                sd[f"{rn}.{u}.{cv}.weight"] = np.zeros((f, f, 3, 3),
                                                       np.float32)
                sd[f"{rn}.{u}.{cv}.bias"] = np.zeros(f, np.float32)
        sd[f"{rn}.out_conv.weight"] = np.zeros((f, f, 1, 1), np.float32)
        sd[f"{rn}.out_conv.bias"] = np.zeros(f, np.float32)
    sd["scratch.output_conv.0.weight"] = np.zeros((f // 2, f, 3, 3),
                                                  np.float32)
    sd["scratch.output_conv.0.bias"] = np.zeros(f // 2, np.float32)
    sd["scratch.output_conv.2.weight"] = np.zeros((32, f // 2, 3, 3),
                                                  np.float32)
    sd["scratch.output_conv.2.bias"] = np.zeros(32, np.float32)
    sd["scratch.output_conv.4.weight"] = np.zeros((1, 32, 1, 1), np.float32)
    sd["scratch.output_conv.4.bias"] = np.zeros(1, np.float32)

    variables = convert.convert_dpt_state_dict(sd, cfg)
    model = DPTScaleMapLearner(config=cfg)
    template = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 384, 384, 3)), jnp.zeros((1, 384, 384, 1)))
    problems = convert.check_tree_matches(variables["params"],
                                          template["params"])
    assert not problems, problems[:10]


def test_swin2_rejects_indivisible_grids():
    import pytest

    cfg = Swin2Config(embed_dim=EMBED, depths=DEPTHS, num_heads=HEADS,
                      window_size=WINDOW,
                      pretrained_window_sizes=PRETRAINED)
    model = SwinV2Backbone(config=cfg)
    with pytest.raises(ValueError, match="not divisible"):
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 88, 3)))


def _torch_swin_v1_attention(dim, heads, window):
    """Minimal timm swin_transformer.py V1 WindowAttention twin."""
    class WA(nn.Module):
        def __init__(self):
            super().__init__()
            self.num_heads = heads
            self.scale = (dim // heads) ** -0.5
            self.qkv = nn.Linear(dim, 3 * dim, bias=True)
            self.proj = nn.Linear(dim, dim)
            self.relative_position_bias_table = nn.Parameter(
                torch.randn((2 * window - 1) ** 2, heads) * 0.02)
            coords = torch.stack(torch.meshgrid(
                torch.arange(window), torch.arange(window),
                indexing="ij")).flatten(1)
            rel = coords[:, :, None] - coords[:, None, :]
            rel = rel.permute(1, 2, 0).contiguous()
            rel[:, :, 0] += window - 1
            rel[:, :, 1] += window - 1
            rel[:, :, 0] *= 2 * window - 1
            self.register_buffer("rpi", rel.sum(-1))

        def forward(self, x, mask=None):
            B, N, C = x.shape
            qkv = self.qkv(x).reshape(B, N, 3, self.num_heads,
                                      C // self.num_heads)
            q, k, v = qkv.permute(2, 0, 3, 1, 4).unbind(0)
            attn = (q @ k.transpose(-2, -1)) * self.scale
            bias = self.relative_position_bias_table[
                self.rpi.view(-1)].view(N, N, -1).permute(2, 0, 1)
            attn = attn + bias.unsqueeze(0)
            if mask is not None:
                nW = mask.shape[0]
                attn = attn.view(B // nW, nW, self.num_heads, N, N)
                attn = attn + mask.unsqueeze(1).unsqueeze(0)
                attn = attn.view(-1, self.num_heads, N, N)
            attn = attn.softmax(dim=-1)
            x = (attn @ v).transpose(1, 2).reshape(B, N, C)
            return self.proj(x)
    return WA()


def test_swin_v1_attention_matches_torch(rng):
    """WindowAttentionV1 vs a timm swin V1 WindowAttention twin, with and
    without the shifted-window mask."""
    from riders_tpu.models.swin2 import (WindowAttentionV1, _rel_pos_index,
                                         _shift_mask)

    dim, heads, window = 32, 4, 4
    torch.manual_seed(0)
    twin = _torch_swin_v1_attention(dim, heads, window)
    twin.eval()

    flax_mod = WindowAttentionV1(dim, heads, window)
    x = rng.standard_normal((8, window * window, dim)).astype(np.float32)
    variables = flax_mod.init(jax.random.PRNGKey(0), jnp.asarray(x), None)
    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    params = {
        "qkv": {"kernel": sd["qkv.weight"].T, "bias": sd["qkv.bias"]},
        "proj": {"kernel": sd["proj.weight"].T, "bias": sd["proj.bias"]},
        "rel_pos_bias_table": sd["relative_position_bias_table"],
    }
    import flax
    flax.core.freeze(params)  # structural sanity

    with torch.no_grad():
        ref = twin(torch.from_numpy(x)).numpy()
    ours = flax_mod.apply({"params": params}, jnp.asarray(x), None)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)

    mask = _shift_mask(8, 8, window, window // 2)
    with torch.no_grad():
        ref = twin(torch.from_numpy(x),
                   torch.from_numpy(mask)).numpy()
    ours = flax_mod.apply({"params": params}, jnp.asarray(x), mask)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)


@pytest.mark.slow
def test_swin_v1_converter_structure(rng):
    """A synthetic timm swin-V1 state dict converts onto the flax template
    exactly (auto-detected v1 blocks, norm-first merging)."""
    from riders_tpu.models.convert import (_convert_swin2_backbone,
                                           check_tree_matches)
    from riders_tpu.models.swin2 import Swin2Config, SwinV2Backbone

    cfg = Swin2Config(embed_dim=16, depths=(1, 1, 1, 1),
                      num_heads=(1, 2, 4, 8), window_size=4, version=1)
    model = SwinV2Backbone(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    template = jax.device_get(
        model.init(jax.random.PRNGKey(0), x))["params"]

    sd = {}
    p = "pretrained.model."
    sd[p + "patch_embed.proj.weight"] = np.zeros((16, 3, 4, 4), np.float32)
    sd[p + "patch_embed.proj.bias"] = np.zeros(16, np.float32)
    for n in ("patch_embed.norm",):
        sd[p + n + ".weight"] = np.ones(16, np.float32)
        sd[p + n + ".bias"] = np.zeros(16, np.float32)
    for si in range(4):
        dim = 16 * 2 ** si
        window = min(4, 16 // 2 ** si)
        b = p + f"layers.{si}.blocks.0."
        for n in ("norm1", "norm2"):
            sd[b + n + ".weight"] = np.ones(dim, np.float32)
            sd[b + n + ".bias"] = np.zeros(dim, np.float32)
        sd[b + "attn.qkv.weight"] = np.zeros((3 * dim, dim), np.float32)
        sd[b + "attn.qkv.bias"] = np.zeros(3 * dim, np.float32)
        sd[b + "attn.relative_position_bias_table"] = np.zeros(
            ((2 * window - 1) ** 2, 16 * 2 ** si // 16), np.float32)
        sd[b + "attn.relative_position_bias_table"] = np.zeros(
            ((2 * window - 1) ** 2, cfg.num_heads[si]), np.float32)
        sd[b + "attn.proj.weight"] = np.zeros((dim, dim), np.float32)
        sd[b + "attn.proj.bias"] = np.zeros(dim, np.float32)
        sd[b + "mlp.fc1.weight"] = np.zeros((4 * dim, dim), np.float32)
        sd[b + "mlp.fc1.bias"] = np.zeros(4 * dim, np.float32)
        sd[b + "mlp.fc2.weight"] = np.zeros((dim, 4 * dim), np.float32)
        sd[b + "mlp.fc2.bias"] = np.zeros(dim, np.float32)
        if si < 3:
            sd[p + f"layers.{si}.downsample.reduction.weight"] = np.zeros(
                (2 * dim, 4 * dim), np.float32)
            sd[p + f"layers.{si}.downsample.norm.weight"] = np.ones(
                4 * dim, np.float32)
            sd[p + f"layers.{si}.downsample.norm.bias"] = np.zeros(
                4 * dim, np.float32)
    converted = _convert_swin2_backbone(sd, p)
    problems = check_tree_matches(converted, template)
    assert not problems, problems[:8]
