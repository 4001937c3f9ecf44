"""End-to-end DPT converter tests against torch twins.

The twins reproduce DPTDepthModel's module layout (dpt_depth.py:30-185)
at a shrunken scale: a timm-style ViT-L (backbones/vit.py keys) and a
timm-style BEiT-L (backbones/beit.py: q/v-only qkv bias, layer-scale
gammas, decomposed relative position biases), the act_postprocess
reassembly Sequentials (backbones/utils.py:167-244), _make_scratch
refinenets and the DPT output head.  Converted weights must produce
near-fp32-identical predictions.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from riders_tpu.models import convert
from riders_tpu.models.dpt import DPTConfig, DPTScaleMapLearner

DIM = 16
HEADS = 2
DEPTH = 4
GRID = 4                      # pretrained grid = runtime grid (64/16)
NET = (64, 64)
REASSEMBLE = (8, 12, 16, 16)
FEATURES = 8
HOOKS = (0, 1, 2, 3)          # which block taps feed the reassembly


def tiny_config(backbone: str) -> DPTConfig:
    return DPTConfig(
        net_shape=NET, backbone=backbone, embed_dim=DIM, depth=DEPTH,
        num_heads=HEADS, hooks=(0, 1, 2, 3), reassemble_channels=REASSEMBLE,
        features=FEATURES, pretrained_grid=GRID)


def gen_relative_position_index(wh, ww):
    """timm.models.beit.gen_relative_position_index (numpy)."""
    num_rel = (2 * wh - 1) * (2 * ww - 1) + 3
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww),
                                  indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = (flat[:, :, None] - flat[:, None, :]).transpose(1, 2, 0).copy()
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    idx = np.zeros((wh * ww + 1, wh * ww + 1), np.int64)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, 0:] = num_rel - 3
    idx[0:, 0] = num_rel - 2
    idx[0, 0] = num_rel - 1
    return torch.from_numpy(idx)


class TViTAttn(nn.Module):
    def __init__(self):
        super().__init__()
        self.qkv = nn.Linear(DIM, 3 * DIM)
        self.proj = nn.Linear(DIM, DIM)

    def forward(self, x):
        B, N, C = x.shape
        hd = C // HEADS
        qkv = self.qkv(x).reshape(B, N, 3, HEADS, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        attn = (q @ k.transpose(-2, -1)) * hd ** -0.5
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(out)


class TBEiTAttn(nn.Module):
    def __init__(self):
        super().__init__()
        self.qkv = nn.Linear(DIM, 3 * DIM, bias=False)
        self.q_bias = nn.Parameter(torch.zeros(DIM))
        self.v_bias = nn.Parameter(torch.zeros(DIM))
        num_rel = (2 * GRID - 1) * (2 * GRID - 1) + 3
        self.relative_position_bias_table = nn.Parameter(
            torch.zeros(num_rel, HEADS))
        self.proj = nn.Linear(DIM, DIM)

    def _rel_pos_bias(self, window):
        """Reference _get_rel_pos_bias (backbones/beit.py:29-63): when the
        runtime window differs from the pretrained grid, bilinearly resize
        the spatial sub-table (the reference reshapes it width-major; the
        pretrained table is square so the quirk cancels) and keep the 3
        cls rows."""
        wh, ww = window
        table = self.relative_position_bias_table
        if (wh, ww) != (GRID, GRID):
            old = 2 * GRID - 1
            nh_, nw_ = 2 * wh - 1, 2 * ww - 1
            sub = table[:-3].reshape(1, old, old, -1).permute(0, 3, 1, 2)
            sub = F.interpolate(sub, size=(nh_, nw_), mode="bilinear")
            sub = sub.permute(0, 2, 3, 1).reshape(nh_ * nw_, -1)
            table = torch.cat([sub, table[-3:]])
        idx = gen_relative_position_index(wh, ww)
        n = wh * ww + 1
        return table[idx.view(-1)].view(n, n, HEADS).permute(2, 0, 1)

    def forward(self, x, window=None):
        B, N, C = x.shape
        hd = C // HEADS
        bias = torch.cat((self.q_bias, torch.zeros_like(self.q_bias),
                          self.v_bias))
        qkv = F.linear(x, self.qkv.weight, bias)
        qkv = qkv.reshape(B, N, 3, HEADS, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        attn = (q * hd ** -0.5) @ k.transpose(-2, -1)
        rel = self._rel_pos_bias(window or (GRID, GRID))
        attn = attn + rel.unsqueeze(0)
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(out)


class TMlp(nn.Module):
    def __init__(self):
        super().__init__()
        self.fc1 = nn.Linear(DIM, 4 * DIM)
        self.fc2 = nn.Linear(4 * DIM, DIM)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class TBlock(nn.Module):
    def __init__(self, beit):
        super().__init__()
        self.norm1 = nn.LayerNorm(DIM)
        self.attn = TBEiTAttn() if beit else TViTAttn()
        self.norm2 = nn.LayerNorm(DIM)
        self.mlp = TMlp()
        if beit:
            self.gamma_1 = nn.Parameter(torch.ones(DIM))
            self.gamma_2 = nn.Parameter(torch.ones(DIM))
        self.beit = beit

    def forward(self, x, window=None):
        if self.beit:
            x = x + self.gamma_1 * self.attn(self.norm1(x), window)
            return x + self.gamma_2 * self.mlp(self.norm2(x))
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class TBackbone(nn.Module):
    """timm-style model exposing the checkpoint key layout."""

    def __init__(self, beit):
        super().__init__()
        self.cls_token = nn.Parameter(torch.zeros(1, 1, DIM))
        if not beit:
            self.pos_embed = nn.Parameter(
                torch.zeros(1, GRID * GRID + 1, DIM))
        proj = nn.Module()
        self.patch_embed = proj
        proj.proj = nn.Conv2d(3, DIM, 16, 16)
        self.blocks = nn.ModuleList(TBlock(beit) for _ in range(DEPTH))
        self.beit = beit

    def forward_features(self, x):
        gh, gw = x.shape[-2] // 16, x.shape[-1] // 16
        h = self.patch_embed.proj(x)
        h = h.flatten(2).transpose(1, 2)
        h = torch.cat((self.cls_token.expand(h.shape[0], -1, -1), h), dim=1)
        if not self.beit:
            if h.shape[1] != self.pos_embed.shape[1]:
                # Runtime grid differs from the pretrained grid: the
                # reference interpolates the grid part of pos_embed
                # (backbones/vit.py:16-30, F.interpolate bilinear).
                tok, grid = self.pos_embed[:, :1], self.pos_embed[0, 1:]
                gs = int(round(len(grid) ** 0.5))
                grid = grid.reshape(1, gs, gs, -1).permute(0, 3, 1, 2)
                grid = F.interpolate(grid, size=(gh, gw), mode="bilinear")
                grid = grid.permute(0, 2, 3, 1).reshape(1, gh * gw, -1)
                h = h + torch.cat([tok, grid], dim=1)
            else:
                h = h + self.pos_embed
        taps = []
        for blk in self.blocks:
            h = blk(h, (gh, gw)) if self.beit else blk(h)
            taps.append(h)
        return taps


class TProjectReadout(nn.Module):
    def __init__(self):
        super().__init__()
        self.project = nn.Sequential(nn.Linear(2 * DIM, DIM), nn.GELU())

    def forward(self, x):
        readout = x[:, 0].unsqueeze(1).expand_as(x[:, 1:])
        return self.project(torch.cat((x[:, 1:], readout), -1))


def act_postprocess(n):
    """backbones/utils.py:167-244 Sequential (indices 0..4 must match)."""
    c = REASSEMBLE[n - 1]
    mods = [TProjectReadout(), nn.Identity(), nn.Identity(),
            nn.Conv2d(DIM, c, 1)]
    if n == 1:
        mods.append(nn.ConvTranspose2d(c, c, 4, 4))
    elif n == 2:
        mods.append(nn.ConvTranspose2d(c, c, 2, 2))
    elif n == 4:
        mods.append(nn.Conv2d(c, c, 3, 2, 1))
    return nn.Sequential(*mods)


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
    """blocks_large.FeatureFusionBlock_custom (expand=False, size arg)."""

    def __init__(self, f, has_skip):
        super().__init__()
        self.out_conv = nn.Conv2d(f, f, 1)
        self.resConfUnit2 = TRCU(f)
        if has_skip:
            self.resConfUnit1 = TRCU(f)

    def forward(self, x, skip=None, size=None):
        out = x
        if skip is not None:
            out = out + self.resConfUnit1(skip)
        out = self.resConfUnit2(out)
        kw = ({"size": size} if size is not None
              else {"scale_factor": 2})
        out = F.interpolate(out, mode="bilinear", align_corners=True, **kw)
        return self.out_conv(out)


class TDPT(nn.Module):
    def __init__(self, beit):
        super().__init__()
        pre = nn.Module()
        pre.model = TBackbone(beit)
        self.pretrained = pre
        self.pretrained.act_postprocess1 = act_postprocess(1)
        self.pretrained.act_postprocess2 = act_postprocess(2)
        self.pretrained.act_postprocess3 = act_postprocess(3)
        self.pretrained.act_postprocess4 = act_postprocess(4)

        f = FEATURES
        scratch = nn.Module()
        for i, c in enumerate(REASSEMBLE):
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
        gh, gw = x.shape[-2] // 16, x.shape[-1] // 16
        taps = self.pretrained.model.forward_features(x)

        def unflatten(t):
            return t.transpose(1, 2).unflatten(2, (gh, gw))

        layers = []
        for n in range(1, 5):
            seq = getattr(self.pretrained, f"act_postprocess{n}")
            h = seq[0:2](taps[HOOKS[n - 1]])
            h = unflatten(h)
            h = seq[3:](h)
            layers.append(h)
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


def _run_twin(backbone, rng, net=None):
    torch.manual_seed(1)
    tmodel = TDPT(beit=(backbone == "beit")).eval()
    with torch.no_grad():
        for p in tmodel.parameters():
            p.normal_(0, 0.05)

    sd = {k: np.asarray(v.numpy()) for k, v in tmodel.state_dict().items()}
    cfg = tiny_config(backbone)
    if net is not None:
        import dataclasses
        cfg = dataclasses.replace(cfg, net_shape=net)
    variables = convert.convert_dpt_state_dict(sd, cfg)

    model = DPTScaleMapLearner(config=cfg)
    H, W = cfg.net_shape
    x = rng.standard_normal((1, H, W, 3)).astype(np.float32)
    d = (rng.random((1, H, W, 1)) * 5).astype(np.float32)

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
def test_dpt_converter_vit(rng):
    _run_twin("vit", rng)


@pytest.mark.slow
def test_dpt_converter_beit(rng):
    _run_twin("beit", rng)


@pytest.mark.slow
def test_dpt_converter_beit_resized_window(rng):
    """Runtime grid (3, 5) != pretrained grid (4, 4), non-square: both
    sides must resize the pretrained rel-pos-bias spatial sub-table to
    the runtime window (backbones/beit.py:29-63) - the risk surface for
    beitl16_512 running at arbitrary net shapes."""
    _run_twin("beit", rng, net=(48, 80))


def test_dpt_full_size_key_map():
    """Full-size DPTConfig('beit', grid 32): the converter consumes a
    synthetic beitl16_512 state dict with the real key names/shapes and
    produces a tree that matches the model template exactly."""
    cfg = DPTConfig(backbone="beit", pretrained_grid=32,
                    net_shape=(512, 512))
    sd = {}
    D, H4 = cfg.embed_dim, cfg.embed_dim * 4
    sd["pretrained.model.cls_token"] = np.zeros((1, 1, D), np.float32)
    sd["pretrained.model.patch_embed.proj.weight"] = np.zeros(
        (D, 3, 16, 16), np.float32)
    sd["pretrained.model.patch_embed.proj.bias"] = np.zeros(D, np.float32)
    num_rel = (2 * 32 - 1) ** 2 + 3
    for i in range(cfg.depth):
        b = f"pretrained.model.blocks.{i}."
        for ln in ("norm1", "norm2"):
            sd[b + ln + ".weight"] = np.zeros(D, np.float32)
            sd[b + ln + ".bias"] = np.zeros(D, np.float32)
        sd[b + "attn.qkv.weight"] = np.zeros((3 * D, D), np.float32)
        sd[b + "attn.q_bias"] = np.zeros(D, np.float32)
        sd[b + "attn.v_bias"] = np.zeros(D, np.float32)
        sd[b + "attn.relative_position_bias_table"] = np.zeros(
            (num_rel, cfg.num_heads), np.float32)
        sd[b + "attn.proj.weight"] = np.zeros((D, D), np.float32)
        sd[b + "attn.proj.bias"] = np.zeros(D, np.float32)
        sd[b + "mlp.fc1.weight"] = np.zeros((H4, D), np.float32)
        sd[b + "mlp.fc1.bias"] = np.zeros(H4, np.float32)
        sd[b + "mlp.fc2.weight"] = np.zeros((D, H4), np.float32)
        sd[b + "mlp.fc2.bias"] = np.zeros(D, np.float32)
        sd[b + "gamma_1"] = np.zeros(D, np.float32)
        sd[b + "gamma_2"] = np.zeros(D, np.float32)
    for n, c in enumerate(cfg.reassemble_channels, start=1):
        ap = f"pretrained.act_postprocess{n}"
        sd[ap + ".0.project.0.weight"] = np.zeros((D, 2 * D), np.float32)
        sd[ap + ".0.project.0.bias"] = np.zeros(D, np.float32)
        sd[ap + ".3.weight"] = np.zeros((c, D, 1, 1), np.float32)
        sd[ap + ".3.bias"] = np.zeros(c, np.float32)
        if n == 1:
            sd[ap + ".4.weight"] = np.zeros((c, c, 4, 4), np.float32)
            sd[ap + ".4.bias"] = np.zeros(c, np.float32)
        elif n == 2:
            sd[ap + ".4.weight"] = np.zeros((c, c, 2, 2), np.float32)
            sd[ap + ".4.bias"] = np.zeros(c, np.float32)
        elif n == 4:
            sd[ap + ".4.weight"] = np.zeros((c, c, 3, 3), np.float32)
            sd[ap + ".4.bias"] = np.zeros(c, np.float32)
    f = cfg.features
    for n, c in enumerate(cfg.reassemble_channels, start=1):
        sd[f"scratch.layer{n}_rn.weight"] = np.zeros((f, c, 3, 3),
                                                     np.float32)
    for n in (1, 2, 3, 4):
        rn = f"scratch.refinenet{n}"
        units = ("resConfUnit1", "resConfUnit2") if n != 4 else (
            "resConfUnit2",)
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
        jnp.zeros((1, 512, 512, 3)), jnp.zeros((1, 512, 512, 1)))
    problems = convert.check_tree_matches(variables["params"],
                                          template["params"])
    assert not problems, problems[:10]


def test_resnetv2_bottleneck_matches_torch(rng):
    """StdConv (weight-standardized, TF-SAME) + GroupNorm bottleneck vs a
    timm resnetv2 non-preact Bottleneck twin (the dpt_hybrid stem)."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    from riders_tpu.models.dpt import ResNetV2Bottleneck

    cin, mid, cout, stride = 64, 32, 128, 2

    class StdConv2dSame(nn.Conv2d):
        def forward(self, x):
            w = self.weight
            w = (w - w.mean(dim=(1, 2, 3), keepdim=True)) / (
                w.var(dim=(1, 2, 3), keepdim=True, unbiased=False)
                + 1e-6).sqrt()
            # TF-SAME asymmetric padding for stride s
            ih, iw = x.shape[-2:]
            kh, kw = w.shape[-2:]
            s = self.stride[0]
            ph = max((-(-ih // s) - 1) * s + kh - ih, 0)
            pw = max((-(-iw // s) - 1) * s + kw - iw, 0)
            x = F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))
            return F.conv2d(x, w, self.bias, self.stride, 0)

    def gn(c, act=True):
        layers = [nn.GroupNorm(32, c, eps=1e-5)]
        if act:
            layers.append(nn.ReLU())
        return nn.Sequential(*layers)

    class Twin(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = StdConv2dSame(cin, mid, 1, bias=False)
            self.norm1 = gn(mid)
            self.conv2 = StdConv2dSame(mid, mid, 3, stride=stride,
                                       bias=False)
            self.norm2 = gn(mid)
            self.conv3 = StdConv2dSame(mid, cout, 1, bias=False)
            self.norm3 = gn(cout, act=False)
            self.dconv = StdConv2dSame(cin, cout, 1, stride=stride,
                                       bias=False)
            self.dnorm = gn(cout, act=False)

        def forward(self, x):
            sc = self.dnorm(self.dconv(x))
            h = self.norm1(self.conv1(x))
            h = self.norm2(self.conv2(h))
            h = self.norm3(self.conv3(h))
            return F.relu(h + sc)

    torch.manual_seed(0)
    twin = Twin().eval()
    for p in twin.parameters():
        with torch.no_grad():
            p.normal_(0, 0.05) if p.ndim > 1 else p.normal_(0, 0.02)

    x = rng.standard_normal((2, 13, 15, cin)).astype(np.float32)
    with torch.no_grad():
        ref = twin(torch.from_numpy(
            x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)

    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    cv = lambda w: w.transpose(2, 3, 1, 0)
    params = {
        "conv1": {"kernel": cv(sd["conv1.weight"])},
        "norm1": {"gn": {"scale": sd["norm1.0.weight"],
                         "bias": sd["norm1.0.bias"]}},
        "conv2": {"kernel": cv(sd["conv2.weight"])},
        "norm2": {"gn": {"scale": sd["norm2.0.weight"],
                         "bias": sd["norm2.0.bias"]}},
        "conv3": {"kernel": cv(sd["conv3.weight"])},
        "norm3": {"gn": {"scale": sd["norm3.0.weight"],
                         "bias": sd["norm3.0.bias"]}},
        "downsample_conv": {"kernel": cv(sd["dconv.weight"])},
        "downsample_norm": {"gn": {"scale": sd["dnorm.0.weight"],
                                   "bias": sd["dnorm.0.bias"]}},
    }
    blk = ResNetV2Bottleneck(mid, cout, stride)
    ours = blk.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-5)
