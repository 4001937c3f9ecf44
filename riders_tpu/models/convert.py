"""Torch checkpoint -> flax parameter conversion.

One-time converters so reference-trained weights evaluate in riders_tpu
(the parity instrument - SURVEY.md "hard parts": pretrained encoders can't
be fetched from torch.hub on TPU pods, and ZJU's small dataset makes
from-scratch encoder quality a risk).

Supported formats:
* SML `.pth` - a bare state_dict, `{"model": state_dict}`, or a lightning
  dict with `model.` prefixes (the tolerant loader of
  modules/midas/base_model.py:5-26), keys following
  MidasNet_small_videpth's layout with a torch.hub
  tf_efficientnet_lite3 backbone (modules/midas/blocks.py:44-64).
* RC-Net `.pth` - `radarnet_encoder_state_dict` / `radarnet_decoder_state_
  dict` dicts (RCNet/rcnet_model.py:211-257), keys following
  networks.py/net_utils.py module names.

Conventions: torch conv weights (O, I, kh, kw) -> flax (kh, kw, I, O);
depthwise (C, 1, kh, kw) -> (kh, kw, 1, C); linear (O, I) -> (I, O);
BatchNorm weight/bias -> scale/bias and running stats -> batch_stats.
Torch is only imported inside `load_torch_checkpoint`; conversion itself
operates on numpy arrays, so the converters are testable without torch.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from riders_tpu.models.efficientnet import LITE3_STAGES


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pth into {key: numpy}, tolerating the reference's
    wrapper formats (base_model.py:11-26)."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "radarnet_encoder_state_dict" in blob:
        sd = {}
        for prefix, sub in (("encoder.", "radarnet_encoder_state_dict"),
                            ("decoder.", "radarnet_decoder_state_dict")):
            for k, v in blob[sub].items():
                k = k.removeprefix("module.")    # DataParallel wrapper
                sd[prefix + k] = v
    else:
        sd = blob.get("model", blob) if isinstance(blob, dict) else blob
        if any(k.startswith("model.") for k in sd):
            sd = {k.removeprefix("model."): v for k, v in sd.items()}
        sd = {k.removeprefix("module."): v for k, v in sd.items()}
    return {k: np.asarray(v.detach().cpu().numpy())
            for k, v in sd.items()}


def _conv(sd, key):
    return np.transpose(sd[key], (2, 3, 1, 0))


def _linear(sd, key):
    return np.transpose(sd[key], (1, 0))


def _conv_entry(sd, prefix, bias=True):
    out = {"kernel": _conv(sd, prefix + ".weight")}
    if bias and prefix + ".bias" in sd:
        out["bias"] = sd[prefix + ".bias"]
    return out


def _bn_params(sd, prefix):
    return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}


def _bn_stats(sd, prefix):
    return {"mean": sd[prefix + ".running_mean"],
            "var": sd[prefix + ".running_var"]}


def _effnet_block_map(stages=LITE3_STAGES) -> Tuple[Tuple[str, str], ...]:
    """(torch_prefix, flax_name) pairs for every lite3 block under the
    MiDaS layer slicing (blocks.py:54-64):
    layer1 = [conv_stem, bn1, act, blocks0, blocks1]; layer2 = [blocks2];
    layer3 = [blocks3, blocks4]; layer4 = [blocks5, blocks6]."""
    layer_of_stage = {0: ("layer1", 3), 1: ("layer1", 4), 2: ("layer2", 0),
                      3: ("layer3", 0), 4: ("layer3", 1), 5: ("layer4", 0),
                      6: ("layer4", 1)}
    pairs = []
    for si, (_, _, _, _, repeats) in enumerate(stages):
        layer, seq_idx = layer_of_stage[si]
        for bi in range(repeats):
            pairs.append((f"pretrained.{layer}.{seq_idx}.{bi}",
                          f"stage{si}_block{bi}"))
    return tuple(pairs)


def convert_sml_state_dict(sd: Dict[str, np.ndarray],
                           stages=LITE3_STAGES) -> Dict[str, Any]:
    """MidasNet_small_videpth state dict -> ScaleMapLearner variables."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["first_conv"] = _conv_entry(sd, "first.0")
    params["first_bn"] = _bn_params(sd, "first.1")
    stats["first_bn"] = _bn_stats(sd, "first.1")

    # efficientnet-lite3 backbone
    eff_p: Dict[str, Any] = {
        "conv_stem": {"kernel": _conv(sd, "pretrained.layer1.0.weight")},
        "bn_stem": _bn_params(sd, "pretrained.layer1.1"),
    }
    eff_s: Dict[str, Any] = {"bn_stem": _bn_stats(sd, "pretrained.layer1.1")}
    for torch_prefix, flax_name in _effnet_block_map(stages):
        is_ds = f"{torch_prefix}.conv_pwl.weight" not in sd
        convs = (("conv_dw", "conv_pw") if is_ds
                 else ("conv_pw", "conv_dw", "conv_pwl"))
        bns = ("bn1", "bn2") if is_ds else ("bn1", "bn2", "bn3")
        bp: Dict[str, Any] = {}
        bs: Dict[str, Any] = {}
        for c in convs:
            bp[c] = {"kernel": _conv(sd, f"{torch_prefix}.{c}.weight")}
        for b in bns:
            bp[b] = _bn_params(sd, f"{torch_prefix}.{b}")
            bs[b] = _bn_stats(sd, f"{torch_prefix}.{b}")
        eff_p[flax_name] = bp
        eff_s[flax_name] = bs
    params["pretrained"] = eff_p
    stats["pretrained"] = eff_s

    for i in (1, 2, 3, 4):
        params[f"layer{i}_rn"] = {
            "kernel": _conv(sd, f"scratch.layer{i}_rn.weight")}

    for i in (1, 2, 3, 4):
        rn = f"scratch.refinenet{i}"
        block: Dict[str, Any] = {
            "out_conv": _conv_entry(sd, f"{rn}.out_conv"),
            "res_conf_unit2": {
                "conv1": _conv_entry(sd, f"{rn}.resConfUnit2.conv1"),
                "conv2": _conv_entry(sd, f"{rn}.resConfUnit2.conv2"),
            },
        }
        if i != 4:  # refinenet4 has no skip input; resConfUnit1 is unused
            block["res_conf_unit1"] = {
                "conv1": _conv_entry(sd, f"{rn}.resConfUnit1.conv1"),
                "conv2": _conv_entry(sd, f"{rn}.resConfUnit1.conv2"),
            }
        params[f"refinenet{i}"] = block

    # The reference's OutputConv module (blocks.py:177-196) nests a second
    # `output_conv` Sequential, so real MidasNet_small_videpth checkpoints
    # key it `scratch.output_conv.output_conv.N.*`; vanilla MiDaS-small
    # checkpoints use the flat `scratch.output_conv.N.*` Sequential.
    oc = ("scratch.output_conv.output_conv"
          if "scratch.output_conv.output_conv.0.weight" in sd
          else "scratch.output_conv")
    params["output_conv"] = {
        "conv1": _conv_entry(sd, f"{oc}.0"),
        "conv2": _conv_entry(sd, f"{oc}.2"),
        "conv3": _conv_entry(sd, f"{oc}.4"),
    }
    return {"params": params, "batch_stats": stats}


def _convblock(sd, prefix, use_bn):
    p = {"conv": {"kernel": _conv(sd, f"{prefix}.conv.weight")}}
    s = {}
    if use_bn and f"{prefix}.batch_norm.weight" in sd:
        p["bn"] = _bn_params(sd, f"{prefix}.batch_norm")
        s["bn"] = _bn_stats(sd, f"{prefix}.batch_norm")
    return p, s


def convert_rcnet_state_dict(sd: Dict[str, np.ndarray]
                             ) -> Dict[str, Any]:
    """RCNetEncoder + MultiScaleDecoder state dicts -> RCNet variables."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    # --- image encoder (networks.py:10-270 / net_utils wrappers) ---
    enc_p: Dict[str, Any] = {}
    enc_s: Dict[str, Any] = {}
    p, s = _convblock(sd, "encoder.encoder_image.conv1", True)
    enc_p["conv1"], enc_s["conv1"] = p, s
    for stage in (2, 3, 4, 5):
        for bi in (0, 1):
            prefix = f"encoder.encoder_image.blocks{stage}.{bi}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for c in ("conv1", "conv2"):
                bp[c], bsc = _convblock(sd, f"{prefix}.{c}", True)
                if bsc:
                    bs[c] = bsc
            if bi == 0 and f"{prefix}.projection.conv.weight" in sd:
                # The torch block always CREATES a projection conv but
                # applies it only on shape/stride mismatch
                # (net_utils.py:300-320) - i.e. only the first block of a
                # stage; later blocks' projection weights are dead.
                bp["projection"], _ = _convblock(
                    sd, f"{prefix}.projection", False)
            enc_p[f"blocks{stage}_{bi}"] = bp
            enc_s[f"blocks{stage}_{bi}"] = bs
    params["encoder_image"] = enc_p
    stats["encoder_image"] = enc_s

    # --- point encoder (networks.py:273-332) ---
    pe: Dict[str, Any] = {}
    for i in range(6):
        name = f"fc{i}" if i < 5 else "fc_out"
        prefix = f"encoder.encoder_depth.mlp.{i}.fully_connected"
        pe[name] = {"linear": {
            "kernel": _linear(sd, prefix + ".weight"),
            "bias": sd[prefix + ".bias"]}}
    params["encoder_depth"] = pe

    # --- attention (linear_attention.py:84-184) ---
    att: Dict[str, Any] = {}
    i = 0
    while f"encoder.attention.layers.{i}.q_proj.weight" in sd:
        lp = f"encoder.attention.layers.{i}"
        att[f"layer{i}"] = {
            "q_proj": {"kernel": _linear(sd, f"{lp}.q_proj.weight")},
            "k_proj": {"kernel": _linear(sd, f"{lp}.k_proj.weight")},
            "v_proj": {"kernel": _linear(sd, f"{lp}.v_proj.weight")},
            "merge": {"kernel": _linear(sd, f"{lp}.merge.weight")},
            "mlp1": {"kernel": _linear(sd, f"{lp}.mlp.0.weight")},
            "mlp2": {"kernel": _linear(sd, f"{lp}.mlp.2.weight")},
            "norm1": {"scale": sd[f"{lp}.norm1.weight"],
                      "bias": sd[f"{lp}.norm1.bias"]},
            "norm2": {"scale": sd[f"{lp}.norm2.weight"],
                      "bias": sd[f"{lp}.norm2.bias"]},
        }
        i += 1
    params["attention"] = att

    dec_p, dec_s = convert_rcnet_decoder_state_dict(sd)
    params["decoder"] = dec_p
    stats["decoder"] = dec_s
    return {"params": params, "batch_stats": stats}


def convert_rcnet_decoder_state_dict(sd):
    """Decoder subtree (networks.py:458-778) from `decoder.*` keys.

    Returns (params, batch_stats) for a standalone
    models.rcnet.MultiScaleDecoder; convert_rcnet_state_dict uses it for
    the full-model mapping.  Multi-resolution output convs
    (networks.py:582-646) are mapped when present (n_resolution > 1)."""
    dec_p: Dict[str, Any] = {}
    dec_s: Dict[str, Any] = {}
    for d in (6, 5, 4, 3, 2, 1, 0):
        prefix = f"decoder.deconv{d}"
        if d > 4 and f"{prefix}.conv.conv.weight" not in sd:
            continue  # network_depth <= d + 1 (networks.py:519-560)
        block_p: Dict[str, Any] = {}
        block_s: Dict[str, Any] = {}
        up_p, up_s = _convblock(sd, f"{prefix}.deconv.conv", True)
        block_p["deconv"] = {"conv": up_p}
        if up_s:
            block_s["deconv"] = {"conv": up_s}
        c_p, c_s = _convblock(sd, f"{prefix}.conv", True)
        block_p["conv"] = c_p
        if c_s:
            block_s["conv"] = c_s
        dec_p[f"deconv{d}"] = block_p
        dec_s[f"deconv{d}"] = block_s
    out_p, _ = _convblock(sd, "decoder.output0", False)
    dec_p["output0"] = out_p
    for r in (1, 2, 3):
        if f"decoder.output{r}.conv.weight" in sd:
            dec_p[f"output{r}"], _ = _convblock(
                sd, f"decoder.output{r}", False)
    return dec_p, dec_s


def _convtranspose(sd, key):
    """torch ConvTranspose2d weight (I, O, kh, kw) -> flax ConvTranspose
    kernel (kh, kw, I, O) with `transpose_kernel=False` (lax.conv_transpose
    correlates with the un-flipped kernel, torch convolves with the flipped
    one, so the spatial axes reverse)."""
    return np.ascontiguousarray(
        np.transpose(sd[key], (2, 3, 0, 1))[::-1, ::-1])


def _mhdpa(sd, prefix, num_heads):
    """timm ViT fused-qkv attention -> flax MultiHeadDotProductAttention
    (query/key/value kernels (C, heads, hd), out kernel (heads, hd, C))."""
    w = sd[prefix + ".qkv.weight"]          # (3C, C)
    b = sd[prefix + ".qkv.bias"]            # (3C,)
    C = w.shape[1]
    hd = C // num_heads
    out = {}
    for name, row in (("query", 0), ("key", 1), ("value", 2)):
        wi = w[row * C:(row + 1) * C]       # (C_out, C_in)
        bi = b[row * C:(row + 1) * C]
        out[name] = {"kernel": wi.T.reshape(C, num_heads, hd),
                     "bias": bi.reshape(num_heads, hd)}
    pw = sd[prefix + ".proj.weight"]        # (C, C)
    out["out"] = {"kernel": pw.T.reshape(num_heads, hd, C),
                  "bias": sd[prefix + ".proj.bias"]}
    return out


def _ln(sd, prefix):
    return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}


def _dense(sd, prefix):
    return {"kernel": _linear(sd, prefix + ".weight"),
            "bias": sd[prefix + ".bias"]}


def convert_dpt_state_dict(sd: Dict[str, np.ndarray], cfg) -> Dict[str, Any]:
    """DPTDepthModel (dpt_depth.py:30-185) state dict -> DPTScaleMapLearner
    variables.

    Handles both backbones the reference ships configs for: plain ViT-L/16
    (`vitl16_384`, backbones/vit.py) and BEiT-L/16 (`beitl16_512`, the
    train_zju.py:189 default; backbones/beit.py with decomposed relative
    position biases, layer-scale gammas and q/v-only qkv biases).

    `cfg` is a models.dpt.DPTConfig whose `backbone`/`pretrained_grid`
    must match the checkpoint (beitl16_512 -> ('beit', 32); vitl16_384 ->
    ('vit', 24)).

    BEiT's relative-position tables keep their spatial block as-is; the 3
    trailing cls rows are permuted from timm's (cls->tok, tok->cls,
    cls<->cls) order to this repo's (cls<->cls, cls->tok, tok->cls) index
    convention (models/dpt.py:_beit_rel_pos_index)."""
    p = "pretrained.model."
    params: Dict[str, Any] = {}

    if cfg.backbone == "swin2":
        params["pretrained"] = _convert_swin2_backbone(sd, p)
        _convert_dpt_scratch(sd, cfg, params)
        return {"params": params}

    if cfg.backbone == "vit_hybrid":
        params["pretrained"] = _convert_hybrid_backbone(sd, p, cfg)
        for n in (3, 4):
            ap = f"pretrained.act_postprocess{n}"
            blk = {
                "readout_project": _dense(sd, f"{ap}.0.project.0"),
                "project": _conv_entry(sd, f"{ap}.3"),
            }
            if n == 4:       # stride-2 conv /2
                blk["resize"] = _conv_entry(sd, f"{ap}.4")
            params[f"reassemble{n}"] = blk
        _convert_dpt_scratch(sd, cfg, params)
        return {"params": params}

    backbone: Dict[str, Any] = {
        "patch_embed": {"kernel": _conv(sd, p + "patch_embed.proj.weight"),
                        "bias": sd[p + "patch_embed.proj.bias"]},
        "cls_token": sd[p + "cls_token"],
    }
    if cfg.backbone == "vit":
        backbone["pos_embed"] = sd[p + "pos_embed"]

    for i in range(cfg.depth):
        bp = p + f"blocks.{i}."
        blk: Dict[str, Any] = {
            "norm1": _ln(sd, bp + "norm1"),
            "norm2": _ln(sd, bp + "norm2"),
            "mlp_fc1": _dense(sd, bp + "mlp.fc1"),
            "mlp_fc2": _dense(sd, bp + "mlp.fc2"),
        }
        if cfg.backbone == "beit":
            table = sd[bp + "attn.relative_position_bias_table"]
            blk["attn"] = {
                "qkv_kernel": _linear(sd, bp + "attn.qkv.weight"),
                "q_bias": sd[bp + "attn.q_bias"],
                "v_bias": sd[bp + "attn.v_bias"],
                # spatial block unchanged; cls rows permuted to our index
                # convention (see docstring)
                "rel_pos_bias_table": np.concatenate(
                    [table[:-3], table[[-1, -3, -2]]], axis=0),
                "proj": _dense(sd, bp + "attn.proj"),
            }
            blk["gamma_1"] = sd[bp + "gamma_1"]
            blk["gamma_2"] = sd[bp + "gamma_2"]
        else:
            blk["attn"] = _mhdpa(sd, bp + "attn", cfg.num_heads)
        backbone[f"block{i}"] = blk
    params["pretrained"] = backbone

    # Reassembly (backbones/utils.py:167-244): readout project, 1x1
    # channel projection, per-tap spatial resize.
    for n in (1, 2, 3, 4):
        ap = f"pretrained.act_postprocess{n}"
        blk = {
            "readout_project": _dense(sd, f"{ap}.0.project.0"),
            "project": _conv_entry(sd, f"{ap}.3"),
        }
        if n in (1, 2):      # ConvTranspose x4 / x2
            blk["resize"] = {"kernel": _convtranspose(sd, f"{ap}.4.weight"),
                             "bias": sd[f"{ap}.4.bias"]}
        elif n == 4:         # stride-2 conv /2
            blk["resize"] = _conv_entry(sd, f"{ap}.4")
        params[f"reassemble{n}"] = blk

    _convert_dpt_scratch(sd, cfg, params)
    return {"params": params}


def _convert_dpt_scratch(sd: Dict[str, np.ndarray], cfg,
                         params: Dict[str, Any],
                         levels: int = 4) -> None:
    """scratch.* (layer_rn / refinenets / output head) - shared by every
    DPT backbone family.  `levels` is 3 for the hierarchical 3-hook
    families (levit_384, dpt_depth.py:131-139); the deepest refinenet
    takes no skip, so its resConfUnit1 is dead weight and skipped."""
    for n in range(1, levels + 1):
        params[f"layer{n}_rn"] = {
            "kernel": _conv(sd, f"scratch.layer{n}_rn.weight")}

    for n in range(1, levels + 1):
        rn = f"scratch.refinenet{n}"
        blk = {
            "out_conv": _conv_entry(sd, f"{rn}.out_conv"),
            "res_conf_unit2": {
                "conv1": _conv_entry(sd, f"{rn}.resConfUnit2.conv1"),
                "conv2": _conv_entry(sd, f"{rn}.resConfUnit2.conv2"),
            },
        }
        if n != levels:  # the deepest refinenet takes no skip
            blk["res_conf_unit1"] = {
                "conv1": _conv_entry(sd, f"{rn}.resConfUnit1.conv1"),
                "conv2": _conv_entry(sd, f"{rn}.resConfUnit1.conv2"),
            }
        params[f"refinenet{n}"] = blk

    params["head_conv1"] = _conv_entry(sd, "scratch.output_conv.0")
    params["head_conv2"] = _conv_entry(sd, "scratch.output_conv.2")
    params["head_conv3"] = _conv_entry(sd, "scratch.output_conv.4")


def _fold_bn(w: np.ndarray, sd, bn_prefix: str, out_axis: int = 0,
             eps: float = 1e-5):
    """Fold an eval-mode BatchNorm into the preceding linear/conv weight
    (timm levit's own `fuse()`, backbones/levit.py:72-84):
    w' = w * gamma/sqrt(var+eps) on the out-channel axis,
    b' = beta - mean * gamma/sqrt(var+eps)."""
    g = sd[bn_prefix + ".weight"]
    s = g / np.sqrt(sd[bn_prefix + ".running_var"] + eps)
    shape = [1] * w.ndim
    shape[out_axis] = -1
    return w * s.reshape(shape), \
        sd[bn_prefix + ".bias"] - sd[bn_prefix + ".running_mean"] * s


def _linear_bn(sd, prefix):
    """timm levit LinearNorm (`.c` Linear without bias + `.bn` BN1d) ->
    folded flax Dense."""
    w, b = _fold_bn(sd[prefix + ".c.weight"], sd, prefix + ".bn")
    return {"kernel": np.ascontiguousarray(w.T), "bias": b}


def _conv_bn(sd, prefix):
    """timm levit ConvNorm (conv no-bias + BN2d) -> folded flax Conv."""
    w, b = _fold_bn(sd[prefix + ".c.weight"], sd, prefix + ".bn")
    return {"kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0))),
            "bias": b}


def _convtranspose_bn(sd, prefix):
    """ConvTransposeNorm (backbones/levit.py:55-84): torch
    ConvTranspose2d weight (I, O, kh, kw) has its out channels on axis 1;
    fold the BN there, then map to flax like _convtranspose."""
    w, b = _fold_bn(sd[prefix + ".c.weight"], sd, prefix + ".bn",
                    out_axis=1)
    return {"kernel": np.ascontiguousarray(
        np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]), "bias": b}


def convert_levit_state_dict(sd: Dict[str, np.ndarray], cfg
                             ) -> Dict[str, Any]:
    """DPT levit_384 (backbones/levit.py + dpt_depth.py:60,96-99) state
    dict -> DPTScaleMapLearner('levit') variables.

    Every LinearNorm/ConvNorm/ConvTransposeNorm BatchNorm is folded into
    its weight (see _fold_bn), so the returned tree has params only.
    `cfg` is a models.dpt.DPTConfig with backbone='levit'; the block walk
    mirrors timm levit_384's flat nn.Sequential numbering (stage blocks
    as Residual pairs, AttentionSubsample + its MLP between stages).

    The learned attention-bias tables are grid-specific (one row per
    unique |dy|,|dx| offset of the token grid the checkpoint was trained
    at, e.g. 14x14 for 224x224).  LeViTAttention/LeViTSubsample gather
    with indices built from the RUNTIME grid and flax apply() does not
    shape-check supplied params, so a net_shape mismatch would silently
    misindex (XLA clamps out-of-range gather indices).  Each table is
    therefore checked here against the offset count cfg.net_shape
    implies, and conversion fails loudly on mismatch."""
    from riders_tpu.models.levit import (LeViTConfig, _bias_idxs,
                                         _grid_points)

    lcfg = cfg.levit or LeViTConfig()
    # Stem: four 3x3/s2 pad-1 convs -> ceil(extent / 16) token grid.
    grid = (-(-cfg.net_shape[0] // 16), -(-cfg.net_shape[1] // 16))

    def _checked_bias(tbl: np.ndarray, n_off: int, name: str
                      ) -> np.ndarray:
        if tbl.shape[-1] != n_off:
            raise ValueError(
                f"levit checkpoint table {name!r} holds {tbl.shape[-1]} "
                f"attention-bias offsets, but net_shape="
                f"{tuple(cfg.net_shape)} implies a {grid} token grid "
                f"needing {n_off}: the checkpoint was trained at a "
                "different input resolution (timm levit_384 ships "
                "14x14 = 224x224 tables); pick the matching net_shape")
        return tbl

    p = "pretrained.model."
    backbone: Dict[str, Any] = {}
    for j in (0, 2, 4, 6):   # stem convs sit at even Sequential slots
        backbone[f"stem_conv{j}"] = _conv_bn(sd, p + f"patch_embed.{j}")

    i = 0
    for si in range(3):
        pts = _grid_points(*grid)
        _, n_off = _bias_idxs(pts, pts)
        for _ in range(lcfg.depths[si]):
            bp = p + f"blocks.{i}.m."
            backbone[f"blocks_{i}"] = {
                "qkv": _linear_bn(sd, bp + "qkv"),
                "proj": _linear_bn(sd, bp + "proj.1"),
                "attention_biases": _checked_bias(
                    sd[bp + "attention_biases"], n_off,
                    bp + "attention_biases"),
            }
            i += 1
            bp = p + f"blocks.{i}.m."
            backbone[f"blocks_{i}"] = {"fc1": _linear_bn(sd, bp + "0"),
                                       "fc2": _linear_bn(sd, bp + "2")}
            i += 1
        if si < 2:
            sub = ((grid[0] - 1) // 2 + 1, (grid[1] - 1) // 2 + 1)
            _, n_off_sub = _bias_idxs(_grid_points(*sub),
                                      _grid_points(*grid), stride=2)
            bp = p + f"blocks.{i}."
            backbone[f"blocks_{i}"] = {
                "kv": _linear_bn(sd, bp + "kv"),
                "q": _linear_bn(sd, bp + "q.1"),
                "proj": _linear_bn(sd, bp + "proj.1"),
                "attention_biases": _checked_bias(
                    sd[bp + "attention_biases"], n_off_sub,
                    bp + "attention_biases"),
            }
            grid = sub
            i += 1
            bp = p + f"blocks.{i}.m."
            backbone[f"blocks_{i}"] = {"fc1": _linear_bn(sd, bp + "0"),
                                       "fc2": _linear_bn(sd, bp + "2")}
            i += 1

    params: Dict[str, Any] = {"pretrained": backbone}
    _convert_dpt_scratch(sd, cfg, params, levels=3)
    for j, slot in enumerate((0, 2)):   # acts sit between (slots 1, 3)
        params[f"stem_transpose_conv{j}"] = _convtranspose_bn(
            sd, f"scratch.stem_transpose.{slot}")
    return {"params": params}


def _bn_affine(sd, prefix, eps: float = 1e-5):
    """Standalone eval-mode BatchNorm -> per-channel Affine
    (models/next_vit.Affine): scale = gamma/sqrt(var+eps),
    bias = beta - mean*scale."""
    s = sd[prefix + ".weight"] / np.sqrt(sd[prefix + ".running_var"] + eps)
    return {"scale": s,
            "bias": sd[prefix + ".bias"] - sd[prefix + ".running_mean"] * s}


def _nv_conv_norm(sd, prefix, conv=".conv", norm=".norm"):
    """Next-ViT ConvBNReLU / PatchEmbed conv (no-bias conv + BN2d) ->
    folded flax Conv {kernel, bias}."""
    w, b = _fold_bn(sd[prefix + conv + ".weight"], sd, prefix + norm)
    return {"kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0))),
            "bias": b}


def _nv_mlp(sd, prefix):
    """Next-ViT Mlp: two 1x1 Conv2d WITH bias -> flax Dense pair."""
    def dense(k):
        w = sd[f"{prefix}.{k}.weight"][:, :, 0, 0]       # (O, I)
        return {"kernel": np.ascontiguousarray(w.T),
                "bias": sd[f"{prefix}.{k}.bias"]}
    return {"conv1": dense("conv1"), "conv2": dense("conv2")}


def _nv_mhca(sd, prefix):
    """Next-ViT MHCA: grouped 3x3 no-bias conv + BN (folded) -> relu ->
    biasless 1x1 projection."""
    return {
        "group_conv": _nv_conv_norm(sd, prefix, ".group_conv3x3"),
        "projection": {
            "kernel": _conv(sd, prefix + ".projection.weight")},
    }


def convert_next_vit_state_dict(sd: Dict[str, np.ndarray], cfg
                                ) -> Dict[str, Any]:
    """DPT next_vit_large_6m state dict -> DPTScaleMapLearner('next_vit')
    variables.

    Key layout is the Next-ViT classification trunk the reference
    instantiates through timm registration
    (backbones/next_vit.py:32-39: `timm.create_model("nextvit_large")`
    after the vendored `classification.nextvit` import registers it;
    hooks on the flat `features` list).  Every BatchNorm is folded: the
    no-bias conv+BN pairs (stem ConvBNReLU, PatchEmbed, MHCA group conv)
    into conv weights, the standalone norms (NCB `.norm`, NTB
    `.norm1/.norm2`, E-MHSA's post-pool BatchNorm1d) into Affine
    scale/bias params - the flax tree has params only, no batch_stats."""
    from riders_tpu.models.next_vit import NextViTConfig, stage_plan

    nvcfg = cfg.next_vit or NextViTConfig()
    types, chans = stage_plan(nvcfg)

    p = "pretrained.model."
    backbone: Dict[str, Any] = {}
    for j in range(4):
        backbone[f"stem_conv{j}"] = _nv_conv_norm(sd, p + f"stem.{j}")

    i = 0
    in_ch = nvcfg.stem_chs[-1]
    for si in range(4):
        for bi, (bt, c) in enumerate(zip(types[si], chans[si])):
            stride = nvcfg.strides[si] if bi == 0 else 1
            bp = p + f"features.{i}"
            blk: Dict[str, Any] = {}
            if bt == "ncb":
                if stride == 2 or in_ch != c:
                    blk["patch_embed"] = {
                        "conv": _nv_conv_norm(sd, bp + ".patch_embed")}
                blk["mhca"] = _nv_mhca(sd, bp + ".mhca")
                blk["norm"] = _bn_affine(sd, bp + ".norm")
                blk["mlp"] = _nv_mlp(sd, bp + ".mlp")
            else:
                mhsa_ch = _next_vit_divisible(c * nvcfg.mix_block_ratio)
                if stride == 2 or in_ch != mhsa_ch:
                    blk["patch_embed"] = {
                        "conv": _nv_conv_norm(sd, bp + ".patch_embed")}
                blk["norm1"] = _bn_affine(sd, bp + ".norm1")
                ea: Dict[str, Any] = {
                    k: {"kernel": _linear(sd, f"{bp}.e_mhsa.{k}.weight"),
                        "bias": sd[f"{bp}.e_mhsa.{k}.bias"]}
                    for k in ("q", "k", "v", "proj")}
                if nvcfg.sr_ratios[si] > 1:
                    ea["norm"] = _bn_affine(sd, bp + ".e_mhsa.norm")
                blk["e_mhsa"] = ea
                blk["projection"] = {
                    "conv": _nv_conv_norm(sd, bp + ".projection")}
                blk["mhca"] = _nv_mhca(sd, bp + ".mhca")
                blk["norm2"] = _bn_affine(sd, bp + ".norm2")
                blk["mlp"] = _nv_mlp(sd, bp + ".mlp")
            backbone[f"blocks_{i}"] = blk
            in_ch = c
            i += 1

    params: Dict[str, Any] = {"pretrained": backbone}
    _convert_dpt_scratch(sd, cfg, params, levels=4)
    return {"params": params}


def _next_vit_divisible(v: float) -> int:
    from riders_tpu.models.next_vit import _make_divisible
    return _make_divisible(v)


def _convert_hybrid_backbone(sd: Dict[str, np.ndarray], p: str,
                             cfg) -> Dict[str, Any]:
    """timm `vit_base_resnet50_384` keys -> models.dpt HybridViTBackbone
    params: ResNetV2 stages (StdConv kernels, GroupNorm scales) under
    patch_embed.backbone, the 1x1 patch-embed proj, and the ViT-B blocks."""
    bb = p + "patch_embed.backbone."

    def gn(prefix):
        return {"gn": {"scale": sd[prefix + ".weight"],
                       "bias": sd[prefix + ".bias"]}}

    resnet: Dict[str, Any] = {
        "stem_conv": {"kernel": _conv(sd, bb + "stem.conv.weight")},
        "stem_norm": gn(bb + "stem.norm"),
    }
    si = 0
    while bb + f"stages.{si}.blocks.0.conv1.weight" in sd:
        bi = 0
        while bb + f"stages.{si}.blocks.{bi}.conv1.weight" in sd:
            b = bb + f"stages.{si}.blocks.{bi}."
            blk = {
                "conv1": {"kernel": _conv(sd, b + "conv1.weight")},
                "norm1": gn(b + "norm1"),
                "conv2": {"kernel": _conv(sd, b + "conv2.weight")},
                "norm2": gn(b + "norm2"),
                "conv3": {"kernel": _conv(sd, b + "conv3.weight")},
                "norm3": gn(b + "norm3"),
            }
            if b + "downsample.conv.weight" in sd:
                blk["downsample_conv"] = {
                    "kernel": _conv(sd, b + "downsample.conv.weight")}
                blk["downsample_norm"] = gn(b + "downsample.norm")
            resnet[f"stage{si}_block{bi}"] = blk
            bi += 1
        si += 1

    out: Dict[str, Any] = {
        "backbone": resnet,
        "patch_embed": {"kernel": _conv(sd, p + "patch_embed.proj.weight"),
                        "bias": sd[p + "patch_embed.proj.bias"]},
        "cls_token": sd[p + "cls_token"],
        "pos_embed": sd[p + "pos_embed"],
    }
    for i in range(cfg.depth):
        bp = p + f"blocks.{i}."
        out[f"block{i}"] = {
            "norm1": _ln(sd, bp + "norm1"),
            "norm2": _ln(sd, bp + "norm2"),
            "mlp_fc1": _dense(sd, bp + "mlp.fc1"),
            "mlp_fc2": _dense(sd, bp + "mlp.fc2"),
            "attn": _mhdpa(sd, bp + "attn", cfg.num_heads),
        }
    return out


def _convert_swin2_backbone(sd: Dict[str, np.ndarray],
                            p: str) -> Dict[str, Any]:
    """timm 0.6.12 swin_transformer(_v2) keys -> models.swin2
    SwinV2Backbone params.  V2 blocks (q/v-only qkv bias, logit scales,
    cpb MLPs) and V1 blocks (full qkv bias, learned rel-pos tables -
    the `swinl12_384` row) are auto-detected per block by the presence of
    `attn.logit_scale`."""
    out: Dict[str, Any] = {
        "patch_embed": {"kernel": _conv(sd, p + "patch_embed.proj.weight"),
                        "bias": sd[p + "patch_embed.proj.bias"]},
        "patch_norm": _ln(sd, p + "patch_embed.norm"),
    }
    si = 0
    while p + f"layers.{si}.blocks.0.norm1.weight" in sd:
        bi = 0
        while p + f"layers.{si}.blocks.{bi}.norm1.weight" in sd:
            b = p + f"layers.{si}.blocks.{bi}."
            blk: Dict[str, Any] = {
                "norm1": _ln(sd, b + "norm1"),
                "norm2": _ln(sd, b + "norm2"),
                "mlp_fc1": _dense(sd, b + "mlp.fc1"),
                "mlp_fc2": _dense(sd, b + "mlp.fc2"),
            }
            if b + "attn.logit_scale" in sd:        # V2 block
                blk["attn"] = {
                    "qkv_kernel": _linear(sd, b + "attn.qkv.weight"),
                    "q_bias": sd[b + "attn.q_bias"],
                    "v_bias": sd[b + "attn.v_bias"],
                    "logit_scale": sd[b + "attn.logit_scale"],
                    "cpb_fc1": _dense(sd, b + "attn.cpb_mlp.0"),
                    "cpb_fc2": {
                        "kernel": _linear(sd, b + "attn.cpb_mlp.2.weight")},
                    "proj": _dense(sd, b + "attn.proj"),
                }
            else:                                   # V1 block
                blk["attn"] = {
                    "qkv": _dense(sd, b + "attn.qkv"),
                    "rel_pos_bias_table":
                        sd[b + "attn.relative_position_bias_table"],
                    "proj": _dense(sd, b + "attn.proj"),
                }
            out[f"stage{si}_block{bi}"] = blk
            bi += 1
        dkey = p + f"layers.{si}.downsample.reduction.weight"
        if dkey in sd:
            out[f"downsample{si}"] = {
                "reduction": {"kernel": _linear(sd, dkey)},
                "norm": _ln(sd, p + f"layers.{si}.downsample.norm"),
            }
        si += 1
    return out


def check_tree_matches(converted: Any, template: Any, path: str = ""
                       ) -> list:
    """Compare a converted pytree against a model-initialized template;
    returns a list of mismatch descriptions (empty = exact match)."""
    problems = []
    if isinstance(template, dict):
        conv = converted if isinstance(converted, dict) else {}
        for k in template:
            if k not in conv:
                problems.append(f"missing {path}/{k}")
            else:
                problems += check_tree_matches(conv[k], template[k],
                                               f"{path}/{k}")
        for k in conv:
            if k not in template:
                problems.append(f"extra {path}/{k}")
        return problems
    t_shape = tuple(np.shape(template))
    c_shape = tuple(np.shape(converted))
    if t_shape != c_shape:
        problems.append(f"shape {path}: {c_shape} vs {t_shape}")
    return problems
