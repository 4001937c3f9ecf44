"""End-to-end RC-Net converter test against a torch twin.

Builds a torch model whose module names reproduce the reference's state
dict keys (networks.py / net_utils.py / rcnet_model.py layouts), runs both
models on the same inputs with converted weights, and requires fp32
agreement.  RoI pooling in the twin uses the numpy golden already
validated against torchvision semantics in test_patches.py.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from riders_tpu.core.config import RCNetConfig
from riders_tpu.models import convert
from riders_tpu.models.rcnet import RCNet

PATCH = (64, 32)
FILTERS = (8, 16, 32, 32, 32)
D_MODEL = 32
DEC_FILTERS = (64, 32, 16, 8, 4)
N_ATT = 1


class TConv(nn.Module):
    """net_utils.Conv2d: conv(pad k//2, bias=False) + BN + leaky(0.2)."""

    def __init__(self, cin, cout, k=3, s=1, bn=True, act=True):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, s, k // 2, bias=False)
        if bn:
            self.batch_norm = nn.BatchNorm2d(cout)
        self.bn = bn
        self.act = act

    def forward(self, x):
        x = self.conv(x)
        if self.bn:
            x = self.batch_norm(x)
        return F.leaky_relu(x, 0.2) if self.act else x


class TResBlock(nn.Module):
    def __init__(self, cin, cout, s):
        super().__init__()
        self.conv1 = TConv(cin, cout, 3, s)
        self.conv2 = TConv(cout, cout, 3, 1)
        self.projection = TConv(cin, cout, 1, s, bn=False, act=False)
        self.needs_proj = (cin != cout or s != 1)

    def forward(self, x):
        out = self.conv2(self.conv1(x))
        sc = self.projection(x) if self.needs_proj else x
        return F.leaky_relu(out + sc, 0.2)


class TImageEncoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = TConv(3, FILTERS[0], 7, 2)
        for i, f in enumerate(FILTERS[1:]):
            s = 1 if i == 0 else 2
            cin = FILTERS[i]
            blocks = nn.Sequential(TResBlock(cin, f, s), TResBlock(f, f, 1))
            setattr(self, f"blocks{i + 2}", blocks)

    def forward(self, x):
        skips = []
        h = self.conv1(x)
        skips.append(h)
        h = F.max_pool2d(h, 3, 2, 1)
        for i in range(4):
            h = getattr(self, f"blocks{i + 2}")(h)
            if i < 3:
                skips.append(h)
        return h, skips


class TFC(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.fully_connected = nn.Linear(cin, cout)

    def forward(self, x):
        return F.leaky_relu(self.fully_connected(x), 0.2)


class TLoFTR(nn.Module):
    def __init__(self, d):
        super().__init__()
        self.q_proj = nn.Linear(d, d, bias=False)
        self.k_proj = nn.Linear(d, d, bias=False)
        self.v_proj = nn.Linear(d, d, bias=False)
        self.merge = nn.Linear(d, d, bias=False)
        self.mlp = nn.Sequential(nn.Linear(2 * d, 2 * d, bias=False),
                                 nn.ReLU(True),
                                 nn.Linear(2 * d, d, bias=False))
        self.norm1 = nn.LayerNorm(d)
        self.norm2 = nn.LayerNorm(d)
        self.nhead = 4
        self.dim = d // 4

    def forward(self, x, source):
        bs = x.size(0)
        q = self.q_proj(x).view(bs, -1, self.nhead, self.dim)
        k = self.k_proj(source).view(bs, -1, self.nhead, self.dim)
        v = self.v_proj(source).view(bs, -1, self.nhead, self.dim)
        Q, K = F.elu(q) + 1, F.elu(k) + 1
        vl = v.size(1)
        KV = torch.einsum("nshd,nshv->nhdv", K, v / vl)
        Z = 1 / (torch.einsum("nlhd,nhd->nlh", Q, K.sum(1)) + 1e-6)
        msg = torch.einsum("nlhd,nhdv,nlh->nlhv", Q, KV, Z) * vl
        msg = self.norm1(self.merge(msg.reshape(bs, -1, x.size(2))))
        msg = self.norm2(self.mlp(torch.cat([x, msg], 2)))
        return x + msg


class TUpConv(nn.Module):
    """net_utils.UpConv2d: nearest resize + TConv named `conv`."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv = TConv(cin, cout, 3, 1)

    def forward(self, x, shape):
        return self.conv(F.interpolate(x, size=shape))


class TDecoderBlock(nn.Module):
    def __init__(self, cin, cskip, cout):
        super().__init__()
        self.deconv = TUpConv(cin, cout)
        self.conv = TConv(cout + cskip, cout, 3, 1)
        self.has_skip = cskip > 0

    def forward(self, x, skip=None, shape=None):
        target = skip.shape[2:4] if skip is not None else shape
        h = self.deconv(x, target)
        if skip is not None:
            h = torch.cat([h, skip], dim=1)
        return self.conv(h)


class TDecoder(nn.Module):
    def __init__(self):
        super().__init__()
        n_skips = list(FILTERS[:-1])[::-1] + [0]
        cin = FILTERS[-1] + D_MODEL
        for d, (f, sk) in enumerate(zip(DEC_FILTERS, n_skips)):
            setattr(self, f"deconv{4 - d}", TDecoderBlock(cin, sk, f))
            cin = f
        self.output0 = TConv(DEC_FILTERS[-1], 1, 3, 1, bn=False, act=False)

    def forward(self, x, skips):
        h = x
        for d in range(4):
            h = getattr(self, f"deconv{4 - d}")(h, skip=skips[3 - d])
        h = self.deconv0(h, shape=PATCH)
        return self.output0(h)


class TRCNet(nn.Module):
    """Named to reproduce the reference checkpoint key layout."""

    def __init__(self):
        super().__init__()
        lh, lw = PATCH[0] // 32, PATCH[1] // 32
        enc = nn.Module()
        enc.encoder_image = TImageEncoder()
        enc.encoder_depth = nn.Module()
        enc.encoder_depth.mlp = nn.Sequential(
            TFC(3, 8), TFC(8, 16), TFC(16, 32), TFC(32, 32), TFC(32, 32),
            TFC(32, D_MODEL * lh * lw))
        enc.attention = nn.Module()
        enc.attention.layers = nn.ModuleList(
            [TLoFTR(D_MODEL) for _ in range(2 * N_ATT)])
        self.encoder = enc
        self.decoder = TDecoder()


def _np_roi_pool(feat_hwc, boxes, scale, out_size):
    H, W, C = feat_hwc.shape
    out_h, out_w = out_size
    out = np.zeros((len(boxes), out_h, out_w, C), np.float32)
    rnd = lambda v: int(math.floor(v * scale + 0.5))
    for bi, (x1, y1, x2, y2) in enumerate(boxes):
        rs_w, rs_h, re_w, re_h = rnd(x1), rnd(y1), rnd(x2), rnd(y2)
        roi_w = max(re_w - rs_w + 1, 1)
        roi_h = max(re_h - rs_h + 1, 1)
        for p in range(out_h):
            hs = min(max(p * roi_h // out_h + rs_h, 0), H)
            he = min(max(-((-(p + 1) * roi_h) // out_h) + rs_h, 0), H)
            for q in range(out_w):
                ws = min(max(q * roi_w // out_w + rs_w, 0), W)
                we = min(max(-((-(q + 1) * roi_w) // out_w) + rs_w, 0), W)
                if he > hs and we > ws:
                    out[bi, p, q] = feat_hwc[hs:he, ws:we].max(axis=(0, 1))
    return out


def torch_rcnet_forward(model, image_hwc, points, boxes):
    """Reference forward (networks.py:389-451, rcnet_model.py:101-123)
    using the numpy roi-pool golden."""
    ph, pw = PATCH
    lh, lw = ph // 32, pw // 32
    x = torch.from_numpy(image_hwc.transpose(2, 0, 1))[None]
    with torch.no_grad():
        latent, skips = model.encoder.encoder_image(x)

        def pool(t, scale, out_size):
            f = t[0].permute(1, 2, 0).numpy()
            return _np_roi_pool(f, boxes, scale, out_size)

        lat_p = pool(latent, 1 / 32., (lh, lw))
        skips_p = [pool(s, 1 / 2 ** (i + 1),
                        (int(ph / 2 ** (i + 1)), int(pw / 2 ** (i + 1))))
                   for i, s in enumerate(skips)]

        K = len(points)
        pl = model.encoder.encoder_depth.mlp(torch.from_numpy(points))
        pl = pl.view(K, D_MODEL, -1, lw)
        pl_tokens = pl.view(K, D_MODEL, -1).permute(0, 2, 1)
        im_tokens = torch.from_numpy(
            lat_p.transpose(0, 3, 1, 2).reshape(K, D_MODEL, -1)
        ).permute(0, 2, 1)

        f0, f1 = pl_tokens, im_tokens
        for i, layer in enumerate(model.encoder.attention.layers):
            if i % 2 == 0:
                f0 = layer(f0, f0)
                f1 = layer(f1, f1)
            else:
                f0 = layer(f0, f1)
                f1 = layer(f1, f0)
        pl_tf = f0.permute(0, 2, 1).view(K, D_MODEL, lh, lw)
        im_tf = f1.permute(0, 2, 1).view(K, D_MODEL, lh, lw)
        fused = torch.cat([im_tf, pl_tf], dim=1)

        skips_t = [torch.from_numpy(s.transpose(0, 3, 1, 2))
                   for s in skips_p]
        logits = model.decoder(fused, skips_t)
    return logits.numpy().transpose(0, 2, 3, 1)


@pytest.mark.slow
def test_rcnet_converter_end_to_end(rng):
    torch.manual_seed(0)
    tmodel = TRCNet().eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.normal_(1.0, 0.1)
                m.bias.normal_(0, 0.1)

    # reference checkpoint format (rcnet_model.py:224-232)
    blob = {
        "train_step": 7,
        "radarnet_encoder_state_dict": tmodel.encoder.state_dict(),
        "radarnet_decoder_state_dict": tmodel.decoder.state_dict(),
    }
    sd = {}
    for prefix, sub in (("encoder.", "radarnet_encoder_state_dict"),
                        ("decoder.", "radarnet_decoder_state_dict")):
        for k, v in blob[sub].items():
            sd[prefix + k] = np.asarray(v.numpy())
    variables = convert.convert_rcnet_state_dict(sd)

    cfg = RCNetConfig(patch_size=PATCH,
                      n_filters_encoder_image=FILTERS,
                      n_neurons_encoder_depth=(8, 16, 32, 32, D_MODEL),
                      n_filters_decoder=DEC_FILTERS,
                      attention_layers=N_ATT, attention_heads=4)
    model = RCNet(config=cfg)

    H, W = 128, 160
    image = rng.random((H, W, 3)).astype(np.float32)
    K = 3
    cx = rng.integers(16, W - 16, K)
    cy = rng.integers(32, H - 32, K)
    boxes = np.stack([cx - 16, cy - 32, cx + 16, cy + 32], 1
                     ).astype(np.float32)
    points = np.stack([cx, cy, rng.random(K) * 40 + 1], 1
                      ).astype(np.float32)

    ref = torch_rcnet_forward(tmodel, image, points, boxes)

    template = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(image)[None],
        jnp.asarray(points)[None], jnp.asarray(boxes)[None],
        jnp.ones((1, K)))
    problems = convert.check_tree_matches(variables["params"],
                                          jax.device_get(template)["params"])
    problems += convert.check_tree_matches(
        variables["batch_stats"], jax.device_get(template)["batch_stats"])
    assert not problems, problems[:10]

    logits = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(image)[None], jnp.asarray(points)[None],
        jnp.asarray(boxes)[None], jnp.ones((1, K)))
    ours = np.asarray(logits)[0]
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)
