"""LeViT-384 backbone for the DPT family (levit_384 row).

Reference anchors: modules/midas/backbones/levit.py:1-196 (the DPT
adapter: hooks [3, 11, 21], patch-grid unflatten, stem_b4_transpose),
modules/midas/blocks_large.py:90-96 (scratch channels [384, 512, 768]),
modules/midas/dpt_depth.py:60,96-99 (3-hook forward + hard-swish
transpose stem).  The backbone body follows the timm `levit_384`
architecture the reference instantiates (hybrid conv stem, interleaved
attention/MLP residual pairs with learned per-offset attention biases,
stride-2 attention subsampling between stages).

TPU-first deviations from the torch original:

* All LinearNorm/ConvNorm BatchNorms are FOLDED into their preceding
  linear/conv by the weight converter (convert.convert_levit_state_dict)
  - exactly timm's own `fuse()` - so the flax modules are plain
  Dense/Conv with bias and no batch_stats collection exists at
  inference.
* Attention biases are gathered once at trace time into dense (Nq, Nkv)
  tables per block (static indices - XLA constant-folds the gather).
* Arbitrary patch grids (gh, gw) are supported; the stride-2 token
  subsample uses the same ceil-division grid as timm's slicing.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Tuple

import numpy as np

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


@dataclasses.dataclass(frozen=True)
class LeViTConfig:
    """timm levit_384 hyperparameters (embed 384/512/768)."""

    embed_dims: Tuple[int, int, int] = (384, 512, 768)
    key_dim: int = 32
    num_heads: Tuple[int, int, int] = (6, 9, 12)
    depths: Tuple[int, int, int] = (4, 4, 4)
    attn_ratio: int = 2
    mlp_ratio: int = 2
    down_attn_ratio: int = 4      # AttentionSubsample attn_ratio
    down_mlp_ratio: int = 2
    hooks: Tuple[int, int, int] = (3, 11, 21)   # flat block indices


def _bias_idxs(points_q, points_kv, stride: int = 1):
    """timm levit attention_bias_idxs: one learned bias per unique
    absolute (dy, dx) offset, gathered into a dense (Nq, Nkv) index."""
    offsets = {}
    idxs = []
    for p1 in points_q:
        for p2 in points_kv:
            off = (abs(p1[0] * stride - p2[0]), abs(p1[1] * stride - p2[1]))
            if off not in offsets:
                offsets[off] = len(offsets)
            idxs.append(offsets[off])
    idx = np.asarray(idxs, np.int32).reshape(len(points_q), len(points_kv))
    return idx, len(offsets)


def _grid_points(gh: int, gw: int):
    return [(y, x) for y in range(gh) for x in range(gw)]


class LeViTAttention(nn.Module):
    """Residual attention block (timm levit Attention): per-head
    interleaved qkv projection, learned offset biases, hard-swish before
    the output projection."""

    dim: int
    key_dim: int
    num_heads: int
    attn_ratio: int
    grid: Tuple[int, int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, N, _ = x.shape
        kd, h = self.key_dim, self.num_heads
        vd = kd * self.attn_ratio
        qkv = nn.Dense(h * (2 * kd + vd), dtype=self.dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(B, N, h, 2 * kd + vd)
        q, k, v = jnp.split(qkv, [kd, 2 * kd], axis=-1)

        gh, gw = self.grid
        idx, n_off = _bias_idxs(_grid_points(gh, gw), _grid_points(gh, gw))
        table = self.param("attention_biases", nn.initializers.zeros,
                           (h, n_off))
        bias = table[:, jnp.asarray(idx).reshape(-1)].reshape(h, N, N)

        attn = jnp.einsum("bnhk,bmhk->bhnm", q, k).astype(jnp.float32)
        attn = attn * (kd ** -0.5) + bias.astype(jnp.float32)
        attn = nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bmhv->bnhv", attn, v).reshape(B, N, h * vd)
        out = nn.hard_swish(out)
        return x + nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class LeViTSubsample(nn.Module):
    """timm levit AttentionSubsample: queries from the stride-2 token
    grid, keys/values from the full grid; NOT residual (the token count
    and width change)."""

    in_dim: int
    out_dim: int
    key_dim: int
    num_heads: int
    attn_ratio: int
    grid: Tuple[int, int]
    stride: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, N, C = x.shape
        kd, h = self.key_dim, self.num_heads
        vd = kd * self.attn_ratio
        gh, gw = self.grid
        sh, sw = (gh - 1) // self.stride + 1, (gw - 1) // self.stride + 1

        kv = nn.Dense(h * (kd + vd), dtype=self.dtype, name="kv")(x)
        kv = kv.reshape(B, N, h, kd + vd)
        k, v = jnp.split(kv, [kd], axis=-1)

        sub = x.reshape(B, gh, gw, C)[:, ::self.stride, ::self.stride]
        sub = sub.reshape(B, sh * sw, C)
        q = nn.Dense(h * kd, dtype=self.dtype, name="q")(sub)
        q = q.reshape(B, sh * sw, h, kd)

        idx, n_off = _bias_idxs(_grid_points(sh, sw), _grid_points(gh, gw),
                                stride=self.stride)
        table = self.param("attention_biases", nn.initializers.zeros,
                           (h, n_off))
        bias = table[:, jnp.asarray(idx).reshape(-1)].reshape(
            h, sh * sw, N)

        attn = jnp.einsum("bnhk,bmhk->bhnm", q, k).astype(jnp.float32)
        attn = attn * (kd ** -0.5) + bias.astype(jnp.float32)
        attn = nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bmhv->bnhv", attn, v).reshape(
            B, sh * sw, h * vd)
        out = nn.hard_swish(out)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="proj")(out)


class LeViTMlp(nn.Module):
    """Residual 2x MLP with hard-swish (timm levit)."""

    dim: int
    ratio: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.dim * self.ratio, dtype=self.dtype,
                     name="fc1")(x)
        h = nn.hard_swish(h)
        return x + nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)


class LeViTBackbone(nn.Module):
    """LeViT-384 trunk returning the 3 hooked feature maps as
    (B, gh_i, gw_i, C_i) - dims (384, 512, 768) at strides 16/32/64
    (backbones/levit.py:16-52 unflattens exactly these grids)."""

    config: LeViTConfig = LeViTConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Sequence[jnp.ndarray]:
        cfg = self.config
        e0 = cfg.embed_dims[0]
        # Hybrid stem (timm stem_b16): four 3x3/s2 conv+BN+hardswish,
        # channels e0/8 -> e0/4 -> e0/2 -> e0; BN folded by the converter.
        h = x.astype(self.dtype)
        for j, c in enumerate((e0 // 8, e0 // 4, e0 // 2, e0)):
            h = nn.Conv(c, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], dtype=self.dtype,
                        name=f"stem_conv{2 * j}")(h)
            h = nn.hard_swish(h)
        B, gh, gw, _ = h.shape
        tokens = h.reshape(B, gh * gw, e0)

        taps = []
        i = 0          # flat block index (timm's nn.Sequential numbering)
        grid = (gh, gw)
        for si in range(3):
            dim = cfg.embed_dims[si]
            for _ in range(cfg.depths[si]):
                tokens = LeViTAttention(
                    dim, cfg.key_dim, cfg.num_heads[si], cfg.attn_ratio,
                    grid, dtype=self.dtype, name=f"blocks_{i}")(tokens)
                if i in cfg.hooks:
                    taps.append(tokens.reshape(B, *grid, dim))
                i += 1
                tokens = LeViTMlp(dim, cfg.mlp_ratio, dtype=self.dtype,
                                  name=f"blocks_{i}")(tokens)
                if i in cfg.hooks:
                    taps.append(tokens.reshape(B, *grid, dim))
                i += 1
            if si < 2:
                out_dim = cfg.embed_dims[si + 1]
                # subsample heads = in_dim // key_dim (timm down_ops)
                tokens = LeViTSubsample(
                    dim, out_dim, cfg.key_dim, dim // cfg.key_dim,
                    cfg.down_attn_ratio, grid, dtype=self.dtype,
                    name=f"blocks_{i}")(tokens)
                grid = ((grid[0] - 1) // 2 + 1, (grid[1] - 1) // 2 + 1)
                if i in cfg.hooks:
                    taps.append(tokens.reshape(B, *grid, out_dim))
                i += 1
                tokens = LeViTMlp(out_dim, cfg.down_mlp_ratio,
                                  dtype=self.dtype,
                                  name=f"blocks_{i}")(tokens)
                if i in cfg.hooks:
                    taps.append(tokens.reshape(B, *grid, out_dim))
                i += 1
        assert len(taps) == 3, (cfg.hooks, i)
        return taps
