"""Swin Transformer V2 backbone for the DPT Scale Map Learner.

The reference's DPT supports the swin2 family through timm
(modules/midas/backbones/swin2.py: swinv2_large_window12to24_192to384 et
al., tapped at the last block of each stage - hooks [1, 1, 17, 1] -
with act_postprocess being a bare unflatten, swin_common.py:35-51).
This is a from-scratch flax implementation of timm 0.6.12's
swin_transformer_v2.py semantics at fixed inference resolution:

* post-norm blocks: x + norm1(attn(x)), x + norm2(mlp(x));
* scaled COSINE attention: L2-normalized q/k per head, a learned
  per-head logit scale clamped at log(100);
* log-spaced continuous relative position bias: a 2-layer MLP (2 -> 512
  -> heads) over the sign(x)*log2(1+8|x|)/log2(8) normalized coordinate
  table, squashed by 16*sigmoid;
* q/v-only qkv bias (k bias is zero);
* cyclic-shift windows on odd blocks with the standard region mask;
  window/shift clamp to the stage resolution (timm _calc_window_shift);
* patch merging (even/even, odd/even, even/odd, odd/odd concat ->
  4C -> 2C linear -> norm) at the END of each non-final stage.

Everything is shape-static: window partitions are reshapes/transposes
XLA fuses, masks and coordinate tables are trace-time numpy constants.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


@dataclasses.dataclass(frozen=True)
class Swin2Config:
    """swinv2_large_window12to24_192to384 by default.

    ``version=1`` selects Swin V1 semantics (timm swin_transformer.py,
    the reference's `swinl12_384` row, blocks_large.py:79-85): pre-norm
    blocks, scaled dot-product attention with a directly-learned relative
    position bias table (no cosine/CPB), full qkv bias, and
    norm-before-reduction patch merging."""

    patch_size: int = 4
    embed_dim: int = 192
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (6, 12, 24, 48)
    window_size: int = 24
    pretrained_window_sizes: Tuple[int, ...] = (12, 12, 12, 6)
    mlp_ratio: float = 4.0
    version: int = 2


# timm swin_large_patch4_window12_384 (the reference's swinl12_384 row).
SWIN1_LARGE = Swin2Config(window_size=12, version=1)


def _rel_pos_index(wh: int, ww: int) -> np.ndarray:
    """Standard swin relative position index for a (wh, ww) window."""
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww),
                                  indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = (flat[:, :, None] - flat[:, None, :]).transpose(1, 2, 0).copy()
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1).astype(np.int32)            # (wh*ww, wh*ww)


def _log_coords_table(window: int, pretrained_window: int) -> np.ndarray:
    """(2w-1, 2w-1, 2) log-spaced normalized relative coordinates
    (swin_transformer_v2.py's relative_coords_table)."""
    r = np.arange(-(window - 1), window, dtype=np.float64)
    table = np.stack(np.meshgrid(r, r, indexing="ij"), axis=-1)
    denom = (pretrained_window - 1) if pretrained_window > 0 else (
        window - 1)
    table = table / denom * 8.0
    table = (np.sign(table) * np.log2(np.abs(table) + 1.0)
             / np.log2(8.0))
    return table.astype(np.float32)


def _shift_mask(h: int, w: int, window: int, shift: int) -> np.ndarray:
    """(nW, win^2, win^2) additive attention mask for shifted windows."""
    img = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift),
               slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift),
                   slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(h // window, window, w // window, window)
    win = win.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = win[:, :, None] - win[:, None, :]
    return np.where(diff == 0, 0.0, -100.0).astype(np.float32)


def _partition(x: jnp.ndarray, window: int) -> jnp.ndarray:
    B, H, W, C = x.shape
    x = x.reshape(B, H // window, window, W // window, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window * window, C)


def _unpartition(x: jnp.ndarray, window: int, B: int, H: int,
                 W: int) -> jnp.ndarray:
    C = x.shape[-1]
    x = x.reshape(B, H // window, W // window, window, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


class WindowAttentionV2(nn.Module):
    dim: int
    num_heads: int
    window: int
    pretrained_window: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 mask: np.ndarray | None) -> jnp.ndarray:
        Bw, N, C = x.shape
        nh = self.num_heads
        hd = C // nh

        qkv_w = self.param("qkv_kernel", nn.initializers.normal(0.02),
                           (C, 3 * C))
        q_bias = self.param("q_bias", nn.initializers.zeros, (C,))
        v_bias = self.param("v_bias", nn.initializers.zeros, (C,))
        qkv = x @ qkv_w.astype(x.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q + q_bias.astype(x.dtype)
        v = v + v_bias.astype(x.dtype)
        q = q.reshape(Bw, N, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(Bw, N, nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(Bw, N, nh, hd).transpose(0, 2, 1, 3)

        # cosine attention with a clamped learned temperature
        # (torch F.normalize semantics: x / max(||x||, 1e-12))
        def l2n(t):
            n = jnp.sqrt(jnp.sum(jnp.square(t.astype(jnp.float32)), -1,
                                 keepdims=True))
            return (t.astype(jnp.float32)
                    / jnp.maximum(n, 1e-12)).astype(t.dtype)

        q = l2n(q)
        k = l2n(k)
        logit_scale = self.param("logit_scale",
                                 lambda *_: jnp.full((nh, 1, 1),
                                                     float(np.log(10.0))),
                                 (nh, 1, 1))
        scale = jnp.exp(jnp.minimum(logit_scale,
                                    jnp.float32(np.log(100.0))))
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32)
        attn = attn * scale[None]

        # continuous relative position bias
        table = jnp.asarray(
            _log_coords_table(self.window, self.pretrained_window)
        ).reshape(-1, 2)
        hmid = nn.Dense(512, use_bias=True, dtype=jnp.float32,
                        name="cpb_fc1")(table)
        bias_tab = nn.Dense(nh, use_bias=False, dtype=jnp.float32,
                            name="cpb_fc2")(nn.relu(hmid))
        idx = jnp.asarray(_rel_pos_index(self.window, self.window))
        bias = bias_tab[idx.reshape(-1)].reshape(N, N, nh)
        bias = 16.0 * jax.nn.sigmoid(bias)
        attn = attn + bias.transpose(2, 0, 1)[None]

        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(Bw // nW, nW, nh, N, N)
            attn = attn + jnp.asarray(mask)[None, :, None]
            attn = attn.reshape(Bw, nh, N, N)
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(Bw, N, C)
        return nn.Dense(C, use_bias=True, dtype=self.dtype,
                        name="proj")(out)


class WindowAttentionV1(nn.Module):
    """Swin V1 window attention (timm swin_transformer.py): scaled
    dot-product with a directly-learned relative position bias table and
    full qkv bias."""

    dim: int
    num_heads: int
    window: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 mask: np.ndarray | None) -> jnp.ndarray:
        Bw, N, C = x.shape
        nh = self.num_heads
        hd = C // nh

        qkv = nn.Dense(3 * C, use_bias=True, dtype=self.dtype,
                       name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(Bw, N, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(Bw, N, nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(Bw, N, nh, hd).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32)
        attn = attn * (hd ** -0.5)

        w = self.window
        table = self.param("rel_pos_bias_table",
                           nn.initializers.normal(0.02),
                           ((2 * w - 1) * (2 * w - 1), nh))
        idx = jnp.asarray(_rel_pos_index(w, w))
        bias = table[idx.reshape(-1)].reshape(N, N, nh)
        attn = attn + bias.transpose(2, 0, 1)[None].astype(jnp.float32)

        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(Bw // nW, nW, nh, N, N)
            attn = attn + jnp.asarray(mask)[None, :, None]
            attn = attn.reshape(Bw, nh, N, N)
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(Bw, N, C)
        return nn.Dense(C, use_bias=True, dtype=self.dtype,
                        name="proj")(out)


class SwinBlockV2(nn.Module):
    """One swin block; ``version=2`` post-norm (V2), ``version=1``
    pre-norm with V1 attention."""

    dim: int
    num_heads: int
    resolution: Tuple[int, int]
    window: int
    shift: int
    pretrained_window: int
    mlp_ratio: float = 4.0
    version: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        H, W = self.resolution
        B = x.shape[0]
        C = self.dim

        def attention(tokens):
            h = tokens.reshape(B, H, W, C)
            if self.shift > 0:
                h = jnp.roll(h, (-self.shift, -self.shift), axis=(1, 2))
                mask = _shift_mask(H, W, self.window, self.shift)
            else:
                mask = None
            wins = _partition(h, self.window)
            if self.version == 1:
                wins = WindowAttentionV1(C, self.num_heads, self.window,
                                         dtype=self.dtype,
                                         name="attn")(wins, mask)
            else:
                wins = WindowAttentionV2(C, self.num_heads, self.window,
                                         self.pretrained_window,
                                         dtype=self.dtype,
                                         name="attn")(wins, mask)
            h = _unpartition(wins, self.window, B, H, W)
            if self.shift > 0:
                h = jnp.roll(h, (self.shift, self.shift), axis=(1, 2))
            return h.reshape(B, H * W, C)

        def mlp(tokens):
            h = nn.Dense(int(C * self.mlp_ratio), dtype=self.dtype,
                         name="mlp_fc1")(tokens)
            h = nn.gelu(h, approximate=False)
            return nn.Dense(C, dtype=self.dtype, name="mlp_fc2")(h)

        norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")
        norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")
        if self.version == 1:
            x = x + attention(norm1(x))
            return x + mlp(norm2(x))
        x = x + norm1(attention(x))
        return x + norm2(mlp(x))


class PatchMergingV2(nn.Module):
    """Patch merging; V2 reduces then norms (2C), V1 norms the 4C concat
    first (timm swin_transformer.py PatchMerging)."""

    out_dim: int
    resolution: Tuple[int, int]
    version: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        H, W = self.resolution
        B, L, C = x.shape
        h = x.reshape(B, H, W, C)
        parts = [h[:, 0::2, 0::2], h[:, 1::2, 0::2],
                 h[:, 0::2, 1::2], h[:, 1::2, 1::2]]
        h = jnp.concatenate(parts, axis=-1).reshape(B, L // 4, 4 * C)
        if self.version == 1:
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name="norm")(h)
            return nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype,
                            name="reduction")(h)
        h = nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype,
                     name="reduction")(h)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(h)


class SwinV2Backbone(nn.Module):
    """Returns the four stage taps as (B, h_i, w_i, C_i) feature maps at
    strides 4/8/16/32 with channels embed_dim * 2^i (the DPT swin hooks
    tap the last block of each stage, swin2.py:8-13)."""

    config: Swin2Config = Swin2Config()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        cfg = self.config
        B, H, W, _ = x.shape
        p = cfg.patch_size
        gh, gw = H // p, W // p

        h = nn.Conv(cfg.embed_dim, (p, p), strides=(p, p),
                    padding="VALID", dtype=self.dtype,
                    name="patch_embed")(x)
        h = h.reshape(B, gh * gw, cfg.embed_dim)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="patch_norm")(h)

        taps: List[jnp.ndarray] = []
        res = (gh, gw)
        for si, depth in enumerate(cfg.depths):
            dim = cfg.embed_dim * (2 ** si)
            # timm _calc_window_shift: clamp to the stage resolution and
            # drop the shift when the window covers it
            window = min(cfg.window_size, min(res))
            if res[0] % window or res[1] % window:
                raise ValueError(
                    f"swin2 stage {si} grid {res} is not divisible by its "
                    f"window {window}; use a square input whose side is a "
                    f"multiple of {cfg.patch_size * cfg.window_size * 2} "
                    "(the reference fixes swin2 nets at 384x384, "
                    "transforms_test.py:284-287)")
            for bi in range(depth):
                shift = (window // 2 if (bi % 2 == 1
                                         and min(res) > window) else 0)
                h = SwinBlockV2(
                    dim, cfg.num_heads[si], res, window, shift,
                    cfg.pretrained_window_sizes[si], cfg.mlp_ratio,
                    version=cfg.version, dtype=self.dtype,
                    name=f"stage{si}_block{bi}")(h)
            taps.append(h.reshape(B, res[0], res[1], dim))
            if si < len(cfg.depths) - 1:
                h = PatchMergingV2(2 * dim, res, version=cfg.version,
                                   dtype=self.dtype,
                                   name=f"downsample{si}")(h)
                res = (res[0] // 2, res[1] // 2)
        return taps
