"""Weight-converter tests.

Two layers of assurance:
1. numeric: small torch modules built here (standard torch layers wired
   like the reference's net_utils/linear_attention/effnet blocks) are run
   against the flax modules with converted weights - outputs must match to
   fp32 tolerance, validating the conv/linear/BN/padding conventions;
2. structural: a synthetic SML/RC-Net state dict with the reference's key
   layout converts into a tree that exactly matches the flax models'
   initialized structure (check_tree_matches returns no problems).
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from riders_tpu.core.config import RCNetConfig, SMLConfig
from riders_tpu.models import convert
from riders_tpu.models.attention import LoFTREncoderLayer
from riders_tpu.models.efficientnet import MBConv
from riders_tpu.models.layers import ConvBlock, ResNetBlock, activation_fn
from riders_tpu.models.rcnet import RCNet
from riders_tpu.models.sml import ScaleMapLearner


def to_sd(module):
    return {k: np.asarray(v.detach().numpy())
            for k, v in module.state_dict().items()}


def test_convblock_matches_torch(rng):
    """net_utils.Conv2d semantics: bias-free conv, pad k//2, BN eps 1e-5,
    leaky_relu 0.2."""
    torch.manual_seed(0)
    tmod = nn.Sequential()
    tmod.conv = nn.Conv2d(8, 16, 3, stride=2, padding=1, bias=False)
    tmod.batch_norm = nn.BatchNorm2d(16)
    tmod.eval()
    with torch.no_grad():
        tmod.batch_norm.running_mean.normal_()
        tmod.batch_norm.running_var.uniform_(0.5, 2.0)
        tmod.batch_norm.weight.normal_()
        tmod.batch_norm.bias.normal_()

    x = rng.standard_normal((2, 12, 16, 8)).astype(np.float32)
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        ref = F.leaky_relu(tmod.batch_norm(tmod.conv(tx)), 0.2)
    ref = ref.numpy().transpose(0, 2, 3, 1)

    sd = to_sd(tmod)
    p = {"conv": {"kernel": convert._conv(sd, "conv.weight")},
         "bn": convert._bn_params(sd, "batch_norm")}
    stats = {"bn": convert._bn_stats(sd, "batch_norm")}

    block = ConvBlock(16, 3, 2, activation_fn("leaky_relu"), True)
    out = block.apply({"params": p, "batch_stats": stats}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)


def test_loftr_layer_matches_torch(rng):
    """Full LoFTR encoder layer vs a torch build of the same wiring
    (linear_attention.py:84-135)."""
    d_model, nhead = 32, 4
    torch.manual_seed(1)

    class TorchLoFTR(nn.Module):
        def __init__(self):
            super().__init__()
            self.q_proj = nn.Linear(d_model, d_model, bias=False)
            self.k_proj = nn.Linear(d_model, d_model, bias=False)
            self.v_proj = nn.Linear(d_model, d_model, bias=False)
            self.merge = nn.Linear(d_model, d_model, bias=False)
            self.mlp = nn.Sequential(
                nn.Linear(d_model * 2, d_model * 2, bias=False),
                nn.ReLU(True),
                nn.Linear(d_model * 2, d_model, bias=False))
            self.norm1 = nn.LayerNorm(d_model)
            self.norm2 = nn.LayerNorm(d_model)

        def forward(self, x, source):
            bs = x.size(0)
            dim = d_model // nhead
            q = self.q_proj(x).view(bs, -1, nhead, dim)
            k = self.k_proj(source).view(bs, -1, nhead, dim)
            v = self.v_proj(source).view(bs, -1, nhead, dim)
            Q = F.elu(q) + 1
            K = F.elu(k) + 1
            vl = v.size(1)
            values = v / vl
            KV = torch.einsum("nshd,nshv->nhdv", K, values)
            Z = 1 / (torch.einsum("nlhd,nhd->nlh", Q, K.sum(dim=1)) + 1e-6)
            msg = torch.einsum("nlhd,nhdv,nlh->nlhv", Q, KV, Z) * vl
            msg = self.merge(msg.reshape(bs, -1, d_model))
            msg = self.norm1(msg)
            msg = self.mlp(torch.cat([x, msg], dim=2))
            msg = self.norm2(msg)
            return x + msg

    tmod = TorchLoFTR().eval()
    with torch.no_grad():
        for p_ in tmod.parameters():
            p_.normal_(0, 0.2)

    x = rng.standard_normal((2, 9, d_model)).astype(np.float32)
    src = rng.standard_normal((2, 9, d_model)).astype(np.float32)
    with torch.no_grad():
        ref = tmod(torch.from_numpy(x), torch.from_numpy(src)).numpy()

    sd = to_sd(tmod)
    params = {
        "q_proj": {"kernel": convert._linear(sd, "q_proj.weight")},
        "k_proj": {"kernel": convert._linear(sd, "k_proj.weight")},
        "v_proj": {"kernel": convert._linear(sd, "v_proj.weight")},
        "merge": {"kernel": convert._linear(sd, "merge.weight")},
        "mlp1": {"kernel": convert._linear(sd, "mlp.0.weight")},
        "mlp2": {"kernel": convert._linear(sd, "mlp.2.weight")},
        "norm1": {"scale": sd["norm1.weight"], "bias": sd["norm1.bias"]},
        "norm2": {"scale": sd["norm2.weight"], "bias": sd["norm2.bias"]},
    }
    layer = LoFTREncoderLayer(d_model, nhead, "linear")
    out = layer.apply({"params": params}, jnp.asarray(x), jnp.asarray(src))
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5, rtol=1e-4)


class TorchConv2dSame(nn.Conv2d):
    """TF 'SAME' padding conv (the tf_efficientnet convention)."""

    def forward(self, x):
        ih, iw = x.shape[-2:]
        kh, kw = self.kernel_size
        sh, sw = self.stride
        ph = max((-(-ih // sh) - 1) * sh + kh - ih, 0)
        pw = max((-(-iw // sw) - 1) * sw + kw - iw, 0)
        x = F.pad(x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2])
        return F.conv2d(x, self.weight, self.bias, self.stride, 0,
                        self.dilation, self.groups)


def test_mbconv_matches_torch_tf_same(rng):
    """Inverted-residual block with TF-SAME stride-2 depthwise conv vs the
    flax MBConv (validates the asymmetric-padding convention and BN eps
    1e-3)."""
    torch.manual_seed(2)
    cin, cout, k, s, e = 16, 24, 5, 2, 6
    mid = cin * e

    class TorchMB(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv_pw = nn.Conv2d(cin, mid, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(mid, eps=1e-3)
            self.conv_dw = TorchConv2dSame(mid, mid, k, stride=s,
                                           groups=mid, bias=False)
            self.bn2 = nn.BatchNorm2d(mid, eps=1e-3)
            self.conv_pwl = nn.Conv2d(mid, cout, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(cout, eps=1e-3)

        def forward(self, x):
            h = F.relu6(self.bn1(self.conv_pw(x)))
            h = F.relu6(self.bn2(self.conv_dw(h)))
            return self.bn3(self.conv_pwl(h))

    tmod = TorchMB().eval()
    with torch.no_grad():
        for m in tmod.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.normal_(1.0, 0.1)
                m.bias.normal_(0, 0.1)

    x = rng.standard_normal((1, 19, 23, cin)).astype(np.float32)
    with torch.no_grad():
        ref = tmod(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ref = ref.transpose(0, 2, 3, 1)

    sd = to_sd(tmod)
    params = {
        "conv_pw": {"kernel": convert._conv(sd, "conv_pw.weight")},
        "conv_dw": {"kernel": convert._conv(sd, "conv_dw.weight")},
        "conv_pwl": {"kernel": convert._conv(sd, "conv_pwl.weight")},
        "bn1": convert._bn_params(sd, "bn1"),
        "bn2": convert._bn_params(sd, "bn2"),
        "bn3": convert._bn_params(sd, "bn3"),
    }
    stats = {"bn1": convert._bn_stats(sd, "bn1"),
             "bn2": convert._bn_stats(sd, "bn2"),
             "bn3": convert._bn_stats(sd, "bn3")}
    block = MBConv(cout, k, s, e)
    out = block.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-5, rtol=1e-3)


def _synth_sml_state_dict(variables):
    """Build a reference-keyed SML state dict whose shapes invert the
    converter mapping (structure check only; numerics covered above)."""
    sd = {}

    def inv_conv(k):
        return np.transpose(np.asarray(k), (3, 2, 0, 1))

    p = variables["params"]
    s = variables["batch_stats"]

    def put_bn(prefix, bp, bs):
        sd[prefix + ".weight"] = np.asarray(bp["scale"])
        sd[prefix + ".bias"] = np.asarray(bp["bias"])
        sd[prefix + ".running_mean"] = np.asarray(bs["mean"])
        sd[prefix + ".running_var"] = np.asarray(bs["var"])

    sd["first.0.weight"] = inv_conv(p["first_conv"]["kernel"])
    sd["first.0.bias"] = np.asarray(p["first_conv"]["bias"])
    put_bn("first.1", p["first_bn"], s["first_bn"])

    sd["pretrained.layer1.0.weight"] = inv_conv(
        p["pretrained"]["conv_stem"]["kernel"])
    put_bn("pretrained.layer1.1", p["pretrained"]["bn_stem"],
           s["pretrained"]["bn_stem"])
    for torch_prefix, flax_name in convert._effnet_block_map():
        bp = p["pretrained"][flax_name]
        bs = s["pretrained"][flax_name]
        for c in bp:
            if c.startswith("conv"):
                sd[f"{torch_prefix}.{c}.weight"] = inv_conv(bp[c]["kernel"])
            else:
                put_bn(f"{torch_prefix}.{c}", bp[c], bs[c])
    for i in (1, 2, 3, 4):
        sd[f"scratch.layer{i}_rn.weight"] = inv_conv(
            p[f"layer{i}_rn"]["kernel"])
    for i in (1, 2, 3, 4):
        rp = p[f"refinenet{i}"]
        sd[f"scratch.refinenet{i}.out_conv.weight"] = inv_conv(
            rp["out_conv"]["kernel"])
        sd[f"scratch.refinenet{i}.out_conv.bias"] = np.asarray(
            rp["out_conv"]["bias"])
        units = ["res_conf_unit2"] + (
            ["res_conf_unit1"] if "res_conf_unit1" in rp else [])
        for unit in units:
            tname = "resConfUnit2" if unit.endswith("2") else "resConfUnit1"
            for c in ("conv1", "conv2"):
                sd[f"scratch.refinenet{i}.{tname}.{c}.weight"] = inv_conv(
                    rp[unit][c]["kernel"])
                sd[f"scratch.refinenet{i}.{tname}.{c}.bias"] = np.asarray(
                    rp[unit][c]["bias"])
    for idx, c in ((0, "conv1"), (2, "conv2"), (4, "conv3")):
        sd[f"scratch.output_conv.{idx}.weight"] = inv_conv(
            p["output_conv"][c]["kernel"])
        sd[f"scratch.output_conv.{idx}.bias"] = np.asarray(
            p["output_conv"][c]["bias"])
    return sd


@pytest.mark.slow
def test_sml_conversion_structure():
    cfg = SMLConfig(net_shape=(64, 96))
    model = ScaleMapLearner(config=cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 64, 96, 3)),
                                    jnp.ones((1, 64, 96, 1)))
    variables = jax.device_get(variables)
    sd = _synth_sml_state_dict(variables)
    converted = convert.convert_sml_state_dict(sd)
    problems = convert.check_tree_matches(converted["params"],
                                          variables["params"])
    problems += convert.check_tree_matches(converted["batch_stats"],
                                           variables["batch_stats"])
    assert not problems, problems[:10]
    # converted values must round-trip exactly
    np.testing.assert_array_equal(
        converted["params"]["first_conv"]["kernel"],
        variables["params"]["first_conv"]["kernel"])
