"""Next-ViT-Large-6M backbone for the DPT family (next_vit_large_6m row).

Reference anchors: modules/midas/backbones/next_vit.py:1-39 (the DPT
adapter: forward hooks on the flat `features` list at [2, 6, 36, 39]),
modules/midas/dpt_depth.py:59,66-69 (hook indices + scratch channels
[96, 256, 512, 1024]), modules/midas/blocks_large.py:84-89.  The trunk
follows the timm `nextvit_large` architecture the reference instantiates
(Next-ViT, Li et al. 2022): a 4-conv stem to /4, then four stages of
Next Convolution Blocks (NCB: multi-head convolutional attention + MLP)
with one Next Transformer Block (NTB: efficient spatially-reduced MHSA
mixed with MHCA) closing each transformer-bearing group - depths
(3, 4, 30, 3), stage channels 96 / 192->256 / (384x4,512)x6 /
768->1024, strides /4 /8 /16 /32.

TPU-first deviations from the torch original:

* Every BatchNorm (2d and the E-MHSA's 1d) is FOLDED by the weight
  converter (convert.convert_next_vit_state_dict): conv+BN pairs fold
  into the conv weights, standalone norms become per-channel affine
  params - inference has no batch_stats collection.
* NHWC layout throughout; attention logits accumulate in f32.
* The E-MHSA spatial reduction reproduces timm's AvgPool1d over the
  row-major token sequence literally (groups of sr^2 CONSECUTIVE
  tokens, remainder truncated) - a quirk, not a 2-D pool, kept for
  checkpoint parity.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _make_divisible(v: float, divisor: int = 32) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


@dataclasses.dataclass(frozen=True)
class NextViTConfig:
    """timm nextvit_large hyperparameters.  `stage_chans` overrides the
    per-block output-channel plan (test twins shrink it); None selects
    the nextvit_large plan."""

    depths: Tuple[int, int, int, int] = (3, 4, 30, 3)
    strides: Tuple[int, int, int, int] = (1, 2, 2, 2)
    sr_ratios: Tuple[int, int, int, int] = (8, 4, 2, 1)
    stem_chs: Tuple[int, int, int] = (64, 32, 64)
    head_dim: int = 32
    mix_block_ratio: float = 0.75
    mlp_ratio_ncb: int = 3
    mlp_ratio_ntb: int = 2
    hooks: Tuple[int, ...] = (2, 6, 36, 39)
    stage_chans: Any = None


def stage_plan(cfg: NextViTConfig
               ) -> Tuple[List[List[str]], List[List[int]]]:
    """Per-stage block types and output channels (timm nextvit
    stage_block_types / stage_out_channels for the large plan)."""
    d = cfg.depths
    types = [["ncb"] * d[0],
             ["ncb"] * (d[1] - 1) + ["ntb"],
             (["ncb"] * 4 + ["ntb"]) * (d[2] // 5),
             ["ncb"] * (d[3] - 1) + ["ntb"]]
    if cfg.stage_chans is not None:
        chans = [list(c) for c in cfg.stage_chans]
    else:
        chans = [[96] * d[0],
                 [192] * (d[1] - 1) + [256],
                 ([384] * 4 + [512]) * (d[2] // 5),
                 [768] * (d[3] - 1) + [1024]]
    assert [len(c) for c in chans] == list(d), (chans, d)
    return types, chans


class Affine(nn.Module):
    """A folded BatchNorm: per-channel scale + bias."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return x * scale.astype(self.dtype) + bias.astype(self.dtype)


def _avgpool2x2_ceil(x: jnp.ndarray) -> jnp.ndarray:
    """AvgPool2d((2,2), stride 2, ceil_mode=True, count_include_pad=False)."""
    B, H, W, C = x.shape
    ph, pw = H % 2, W % 2
    if ph or pw:
        s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 2, 2, 1),
                                  (1, 2, 2, 1),
                                  ((0, 0), (0, ph), (0, pw), (0, 0)))
        n = jax.lax.reduce_window(jnp.ones((1, H, W, 1), x.dtype), 0.0,
                                  jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                                  ((0, 0), (0, ph), (0, pw), (0, 0)))
        return s / n
    return x.reshape(B, H // 2, 2, W // 2, 2, C).mean(axis=(2, 4))


class PatchEmbed(nn.Module):
    """nextvit PatchEmbed: stride-2 -> ceil avgpool + 1x1 conv (+folded
    BN); channel change -> 1x1 conv (+folded BN); else identity."""

    in_ch: int
    out_ch: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.stride == 2:
            x = _avgpool2x2_ceil(x)
            return nn.Conv(self.out_ch, (1, 1), use_bias=True,
                           dtype=self.dtype, name="conv")(x)
        if self.in_ch != self.out_ch:
            return nn.Conv(self.out_ch, (1, 1), use_bias=True,
                           dtype=self.dtype, name="conv")(x)
        return x


class MHCA(nn.Module):
    """Multi-Head Convolutional Attention: grouped 3x3 conv (+folded BN)
    -> relu -> biasless 1x1 projection."""

    dim: int
    head_dim: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Conv(self.dim, (3, 3), padding=[(1, 1), (1, 1)],
                    feature_group_count=self.dim // self.head_dim,
                    use_bias=True, dtype=self.dtype, name="group_conv")(x)
        h = nn.relu(h)
        return nn.Conv(self.dim, (1, 1), use_bias=False, dtype=self.dtype,
                       name="projection")(h)


class Mlp(nn.Module):
    """1x1-conv MLP with relu (nextvit Mlp)."""

    dim: int
    hidden: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.hidden, dtype=self.dtype, name="conv1")(x)
        h = nn.relu(h)
        return nn.Dense(self.dim, dtype=self.dtype, name="conv2")(h)


class NCBlock(nn.Module):
    """Next Convolution Block: patch_embed -> +MHCA -> norm -> +MLP."""

    in_ch: int
    out_ch: int
    stride: int
    mlp_ratio: int
    head_dim: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = PatchEmbed(self.in_ch, self.out_ch, self.stride,
                       dtype=self.dtype, name="patch_embed")(x)
        x = x + MHCA(self.out_ch, self.head_dim, dtype=self.dtype,
                     name="mhca")(x)
        out = Affine(self.out_ch, dtype=self.dtype, name="norm")(x)
        hidden = _make_divisible(self.out_ch * self.mlp_ratio)
        return x + Mlp(self.out_ch, hidden, dtype=self.dtype,
                       name="mlp")(out)


class EMHSA(nn.Module):
    """Efficient MHSA: keys/values from an sr^2-token average pool of
    the row-major sequence (+ folded BatchNorm1d affine)."""

    dim: int
    sr_ratio: int
    head_dim: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        B, N, C = tokens.shape
        heads = self.dim // self.head_dim
        q = nn.Dense(self.dim, dtype=self.dtype, name="q")(tokens)
        kv_in = tokens
        if self.sr_ratio > 1:
            r = self.sr_ratio ** 2
            n_keep = (N // r) * r
            kv_in = tokens[:, :n_keep].reshape(B, N // r, r, C).mean(axis=2)
            kv_in = Affine(C, dtype=self.dtype, name="norm")(kv_in)
        k = nn.Dense(self.dim, dtype=self.dtype, name="k")(kv_in)
        v = nn.Dense(self.dim, dtype=self.dtype, name="v")(kv_in)
        M = kv_in.shape[1]
        q = q.reshape(B, N, heads, self.head_dim)
        k = k.reshape(B, M, heads, self.head_dim)
        v = v.reshape(B, M, heads, self.head_dim)
        attn = jnp.einsum("bnhk,bmhk->bhnm", q, k).astype(jnp.float32)
        attn = nn.softmax(attn * self.head_dim ** -0.5, axis=-1)
        out = jnp.einsum("bhnm,bmhv->bnhv", attn.astype(tokens.dtype), v)
        out = out.reshape(B, N, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class NTBlock(nn.Module):
    """Next Transformer Block: E-MHSA on a mix_block_ratio slice of the
    channels, MHCA on the rest, concat, MLP."""

    in_ch: int
    out_ch: int
    sr_ratio: int
    stride: int = 1
    mix_block_ratio: float = 0.75
    mlp_ratio: int = 2
    head_dim: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mhsa_ch = _make_divisible(int(self.out_ch * self.mix_block_ratio))
        mhca_ch = self.out_ch - mhsa_ch
        x = PatchEmbed(self.in_ch, mhsa_ch, self.stride, dtype=self.dtype,
                       name="patch_embed")(x)
        B, H, W, _ = x.shape
        out = Affine(mhsa_ch, dtype=self.dtype, name="norm1")(x)
        out = EMHSA(mhsa_ch, self.sr_ratio, self.head_dim,
                    dtype=self.dtype,
                    name="e_mhsa")(out.reshape(B, H * W, mhsa_ch))
        x = x + out.reshape(B, H, W, mhsa_ch)
        out = PatchEmbed(mhsa_ch, mhca_ch, 1, dtype=self.dtype,
                         name="projection")(x)
        out = out + MHCA(mhca_ch, self.head_dim, dtype=self.dtype,
                         name="mhca")(out)
        x = jnp.concatenate([x, out], axis=-1)
        out = Affine(self.out_ch, dtype=self.dtype, name="norm2")(x)
        hidden = _make_divisible(self.out_ch * self.mlp_ratio)
        return x + Mlp(self.out_ch, hidden, dtype=self.dtype,
                       name="mlp")(out)


class NextViTBackbone(nn.Module):
    """nextvit_large trunk returning the 4 hooked feature maps as
    (B, H/s, W/s, C) for s in (4, 8, 16, 32), C in (96, 256, 512, 1024)
    (backbones/next_vit.py:17-28 hooks the flat features list)."""

    config: NextViTConfig = NextViTConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Sequence[jnp.ndarray]:
        cfg = self.config
        s0, s1, s2 = cfg.stem_chs
        h = x.astype(self.dtype)
        # Stem: ConvBNReLU(3,64,s2) -> (64,32) -> (32,64) -> (64,64,s2).
        for j, (c, s) in enumerate(((s0, 2), (s1, 1), (s2, 1), (s2, 2))):
            h = nn.Conv(c, (3, 3), strides=(s, s),
                        padding=[(1, 1), (1, 1)], use_bias=True,
                        dtype=self.dtype, name=f"stem_conv{j}")(h)
            h = nn.relu(h)

        types, chans = stage_plan(cfg)
        taps = []
        i = 0
        in_ch = s2
        for si in range(4):
            for bi, (bt, c) in enumerate(zip(types[si], chans[si])):
                stride = cfg.strides[si] if bi == 0 else 1
                if bt == "ncb":
                    h = NCBlock(in_ch, c, stride, cfg.mlp_ratio_ncb,
                                cfg.head_dim, dtype=self.dtype,
                                name=f"blocks_{i}")(h)
                else:
                    h = NTBlock(in_ch, c, cfg.sr_ratios[si], stride,
                                cfg.mix_block_ratio, cfg.mlp_ratio_ntb,
                                cfg.head_dim, dtype=self.dtype,
                                name=f"blocks_{i}")(h)
                in_ch = c
                if i in cfg.hooks:
                    taps.append(h)
                i += 1
        assert len(taps) == len(cfg.hooks), (cfg.hooks, i)
        return taps
