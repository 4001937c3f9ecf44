"""DPT-Large Scale Map Learner: the reference's big-backbone SML variant.

TPU-native re-design of modules/midas/dpt_depth.py + blocks_large.py +
backbones/vit.py (the `model_type='dpt-large'` path of train_zju.py:187-193):
a ViT-L/16 encoder tapped at four transformer depths, DPT reassembly
(readout projection, spatial restore, per-tap resize), RefineNet fusion at
`features=256`, and the same multiplicative scale-map head
(scales = relu(1 + out), pred = d * scales, inverse-depth clamps).

Backbone families (dpt_depth.py:51-64 hook table; blocks_large.py:33-131):
* 'vit'        - plain ViT (`vitl16_384` hooks [5,11,17,23]; `vitb16_384`
  hooks [2,5,8,11]); the position embedding resizes at trace time with
  the bilinear convention of backbones/vit.py:16-31.
* 'beit'       - BEiT (`beitl16_512` - the train_zju.py:189 default -
  plus the l/16-384 and b/16-384 rows): decomposed relative position
  biases, layer-scale gammas, q/v-only qkv bias.
* 'swin2'      - SwinV2 L/B/T and Swin-V1-L (models/swin2.py version
  switch): hierarchical taps feed the scratch convs directly
  (swin_common.py's bare unflatten).
* 'vit_hybrid' - `vitb_rn50_384` (dpt_hybrid): ResNetV2-50 stages feed a
  1x1 patch embed into ViT-B; taps 1-2 are resnet stage maps
  (backbones/vit.py:120-221).
models/factory.py:DPT_FAMILIES maps model_type strings to these rows;
checkpoint converters live in models.convert (convert_dpt_state_dict).
Swin nets must be square multiples of the window stride (the reference's
swin tables fix 384x384 / 256x256, transforms_test.py:284-287).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from riders_tpu.ops.resize import resize2d

Dtype = Any


@dataclasses.dataclass(frozen=True)
class DPTConfig:
    net_shape: Tuple[int, int] = (512, 672)   # minimal 512-resize of 480x640
    backbone: str = "vit"                     # 'vit' | 'beit' | 'swin2'
    patch_size: int = 16
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    hooks: Tuple[int, ...] = (5, 11, 17, 23)
    reassemble_channels: Tuple[int, ...] = (256, 512, 1024, 1024)
    features: int = 256
    in_channels: int = 3
    min_pred: Optional[float] = 0.1
    max_pred: Optional[float] = 255.0
    # pretrained grid (vit_large_patch16_384: 24x24 + cls;
    # beitl16_512: 32x32 + cls)
    pretrained_grid: int = 24
    # swin2 backbone plan (used when backbone == 'swin2'); None selects
    # the swinv2_large_window12to24_192to384 default
    swin2: Optional[Any] = None
    # levit backbone plan (used when backbone == 'levit'); None selects
    # the timm levit_384 default.  The levit DPT runs a 3-hook decode
    # with a hard-swish ConvTranspose stem after refinenet1 and a
    # narrower head (dpt_depth.py:60,96-99: stem_b4_transpose(256, 128),
    # head_features_1=64, head_features_2=8).
    levit: Optional[Any] = None
    # next_vit backbone plan (used when backbone == 'next_vit'); None
    # selects the timm nextvit_large default (hooks [2, 6, 36, 39],
    # scratch channels [96, 256, 512, 1024] - dpt_depth.py:59,66-69).
    next_vit: Optional[Any] = None
    head_features_1: Optional[int] = None   # None -> features
    head_features_2: int = 32


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.dim,
            use_bias=True, dtype=self.dtype, name="attn")(h, h)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


def _beit_rel_pos_index(gh: int, gw: int):
    """Relative position index for a (gh, gw) window plus cls token - the
    standard BEiT construction (backbones/beit.py window machinery).

    Returns int indices of shape (gh*gw+1, gh*gw+1) into a table of
    (2gh-1)*(2gw-1) + 3 entries (3 extra for cls<->token and cls<->cls)."""
    import numpy as np
    coords = np.stack(np.meshgrid(np.arange(gh), np.arange(gw),
                                  indexing="ij"))             # 2, gh, gw
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]                  # 2, N, N
    rel = rel.transpose(1, 2, 0).copy()
    rel[:, :, 0] += gh - 1
    rel[:, :, 1] += gw - 1
    rel[:, :, 0] *= 2 * gw - 1
    n = gh * gw
    num_rel = (2 * gh - 1) * (2 * gw - 1)
    idx = np.zeros((n + 1, n + 1), np.int32)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, 0:] = num_rel + 1     # cls -> token
    idx[0:, 0] = num_rel + 2     # token -> cls
    idx[0, 0] = num_rel          # cls -> cls
    return idx


class BEiTAttention(nn.Module):
    """BEiT attention: qkv with q/v bias only (no k bias) and a learned
    relative position bias resized to the runtime grid at trace time
    (backbones/beit.py:14-127)."""

    dim: int
    num_heads: int
    grid: Tuple[int, int]
    pretrained_grid: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, N, C = x.shape
        hd = self.dim // self.num_heads
        qkv_w = self.param("qkv_kernel", nn.initializers.normal(0.02),
                           (C, 3 * self.dim))
        q_bias = self.param("q_bias", nn.initializers.zeros, (self.dim,))
        v_bias = self.param("v_bias", nn.initializers.zeros, (self.dim,))
        qkv = x @ qkv_w.astype(x.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q + q_bias.astype(x.dtype)
        v = v + v_bias.astype(x.dtype)
        q = q.reshape(B, N, self.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, N, self.num_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, N, self.num_heads, hd).transpose(0, 2, 1, 3)

        # relative position bias, parametrized at the pretrained square
        # grid, bilinearly resized to the runtime grid (the reference
        # interpolates the pretrained tables, beit.py:29-63).
        pg = self.pretrained_grid
        table = self.param(
            "rel_pos_bias_table", nn.initializers.normal(0.02),
            ((2 * pg - 1) * (2 * pg - 1) + 3, self.num_heads))
        gh, gw = self.grid
        spatial = table[:-3].reshape(2 * pg - 1, 2 * pg - 1, self.num_heads)
        if (gh, gw) != (pg, pg):
            spatial = resize2d(spatial[None], (2 * gh - 1, 2 * gw - 1),
                               "bilinear", align_corners=False)[0]
        full = jnp.concatenate(
            [spatial.reshape(-1, self.num_heads), table[-3:]], axis=0)
        idx = jnp.asarray(_beit_rel_pos_index(gh, gw))
        bias = full[idx.reshape(-1)].reshape(N, N, self.num_heads)
        bias = bias.transpose(2, 0, 1)[None].astype(jnp.float32)

        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32)
        attn = attn / (hd ** 0.5) + bias
        attn = nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class BEiTBlock(nn.Module):
    """BEiT transformer block: layer-scale (gamma) residuals around
    rel-pos-bias attention and the MLP."""

    dim: int
    num_heads: int
    mlp_ratio: float
    grid: Tuple[int, int]
    pretrained_grid: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        g1 = self.param("gamma_1", nn.initializers.ones, (self.dim,))
        g2 = self.param("gamma_2", nn.initializers.ones, (self.dim,))
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        h = BEiTAttention(self.dim, self.num_heads, self.grid,
                          self.pretrained_grid, dtype=self.dtype,
                          name="attn")(h)
        x = x + g1.astype(h.dtype) * h
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(h)
        return x + g2.astype(h.dtype) * h


class ViTBackbone(nn.Module):
    """Plain ViT with cls token, returning token sequences at `hooks`
    (backbones/vit.py forward_flex:33-73 semantics)."""

    config: DPTConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        cfg = self.config
        B, H, W, _ = x.shape
        gh, gw = H // cfg.patch_size, W // cfg.patch_size

        h = nn.Conv(cfg.embed_dim,
                    (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size),
                    padding="VALID", dtype=self.dtype,
                    name="patch_embed")(x)
        tokens = h.reshape(B, gh * gw, cfg.embed_dim)

        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, cfg.embed_dim))
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, cfg.embed_dim)), tokens], axis=1)

        if cfg.backbone == "vit":
            # Absolute position embedding, grid part resized to (gh, gw)
            # (backbones/vit.py:16-31, bilinear).  BEiT carries position
            # information in per-block relative biases instead.
            pos = self.param(
                "pos_embed", nn.initializers.normal(0.02),
                (1, cfg.pretrained_grid * cfg.pretrained_grid + 1,
                 cfg.embed_dim))
            pos_cls, pos_grid = pos[:, :1], pos[:, 1:]
            pos_grid = pos_grid.reshape(
                1, cfg.pretrained_grid, cfg.pretrained_grid, cfg.embed_dim)
            pos_grid = resize2d(pos_grid, (gh, gw), "bilinear",
                                align_corners=False)
            pos_grid = pos_grid.reshape(1, gh * gw, cfg.embed_dim)
            tokens = tokens + jnp.concatenate([pos_cls, pos_grid], axis=1)

        taps = []
        for i in range(cfg.depth):
            if cfg.backbone == "beit":
                tokens = BEiTBlock(
                    cfg.embed_dim, cfg.num_heads, cfg.mlp_ratio, (gh, gw),
                    cfg.pretrained_grid, dtype=self.dtype,
                    name=f"block{i}")(tokens)
            else:
                tokens = ViTBlock(cfg.embed_dim, cfg.num_heads,
                                  cfg.mlp_ratio, dtype=self.dtype,
                                  name=f"block{i}")(tokens)
            if i in cfg.hooks:
                taps.append(tokens)
        return taps, (gh, gw)


class StdConv(nn.Module):
    """Weight-standardized conv with TF-SAME padding (timm StdConv2dSame,
    the ResNetV2 conv of `vit_base_resnet50_384`): per-output-channel
    zero-mean unit-var kernel standardization, eps 1e-6, biased variance."""

    features: int
    kernel: int
    stride: int = 1
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.kernel, self.kernel, x.shape[-1],
                        self.features))
        kf = k.astype(jnp.float32)
        mean = jnp.mean(kf, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(kf, axis=(0, 1, 2), keepdims=True)
        kf = (kf - mean) / jnp.sqrt(var + 1e-6)
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kf.astype(self.dtype),
            (self.stride, self.stride), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros,
                                   (self.features,)).astype(out.dtype)
        return out


class _GNAct(nn.Module):
    """GroupNorm(32) + optional relu (timm GroupNormAct)."""

    apply_act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                         name="gn")(x)
        return nn.relu(h) if self.apply_act else h


class ResNetV2Bottleneck(nn.Module):
    """timm resnetv2.Bottleneck (preact=False): 1x1/3x3/1x1 StdConvs with
    GroupNorm+relu after each, norm-no-act on the last and the projection,
    relu after the residual add."""

    mid: int
    out: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        shortcut = x
        if x.shape[-1] != self.out or self.stride != 1:
            shortcut = StdConv(self.out, 1, self.stride, dtype=self.dtype,
                               name="downsample_conv")(x)
            shortcut = _GNAct(False, dtype=self.dtype,
                              name="downsample_norm")(shortcut)
        h = StdConv(self.mid, 1, 1, dtype=self.dtype, name="conv1")(x)
        h = _GNAct(dtype=self.dtype, name="norm1")(h)
        h = StdConv(self.mid, 3, self.stride, dtype=self.dtype,
                    name="conv2")(h)
        h = _GNAct(dtype=self.dtype, name="norm2")(h)
        h = StdConv(self.out, 1, 1, dtype=self.dtype, name="conv3")(h)
        h = _GNAct(False, dtype=self.dtype, name="norm3")(h)
        return nn.relu(h + shortcut)


class ResNetV2Stages(nn.Module):
    """The truncated ResNetV2-50 of timm's `vit_base_resnet50_384` hybrid
    patch embed: 'same' stem (7x7/2 StdConv + GN/relu + 3x3/2 SAME pool)
    and three bottleneck stages (3, 4, 9 blocks; 256/512/1024 channels;
    strides 1, 2, 2).  Returns the three stage outputs at /4, /8, /16 -
    the first two are DPT hybrid taps (backbones/vit.py:120-141)."""

    layers: Tuple[int, ...] = (3, 4, 9)
    channels: Tuple[int, ...] = (256, 512, 1024)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        h = StdConv(64, 7, 2, dtype=self.dtype, name="stem_conv")(x)
        h = _GNAct(dtype=self.dtype, name="stem_norm")(h)
        # MaxPool2dSame(3, 2): TF-SAME asymmetric padding.
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding="SAME")
        outs = []
        for si, (n, c) in enumerate(zip(self.layers, self.channels)):
            for bi in range(n):
                stride = 2 if (si > 0 and bi == 0) else 1
                h = ResNetV2Bottleneck(c // 4, c, stride, dtype=self.dtype,
                                       name=f"stage{si}_block{bi}")(h)
            outs.append(h)
        return outs


class HybridViTBackbone(nn.Module):
    """`vitb_rn50_384` (dpt_hybrid): ResNetV2 stages feed a 1x1 patch
    embed into ViT-B/16 blocks; taps 1-2 are the first two resnet stage
    maps, taps 3-4 are transformer token hooks (backbones/vit.py:120-221,
    hooks [0, 1, 8, 11] tap blocks 8 and 11)."""

    config: "DPTConfig"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        cfg = self.config
        B, H, W, _ = x.shape
        f4, f8, f16 = ResNetV2Stages(dtype=self.dtype,
                                     name="backbone")(x)
        gh, gw = f16.shape[1], f16.shape[2]

        h = nn.Conv(cfg.embed_dim, (1, 1), dtype=self.dtype,
                    name="patch_embed")(f16)
        tokens = h.reshape(B, gh * gw, cfg.embed_dim)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, cfg.embed_dim))
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, cfg.embed_dim)), tokens], axis=1)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, cfg.pretrained_grid * cfg.pretrained_grid + 1,
             cfg.embed_dim))
        pos_cls, pos_grid = pos[:, :1], pos[:, 1:]
        pos_grid = pos_grid.reshape(
            1, cfg.pretrained_grid, cfg.pretrained_grid, cfg.embed_dim)
        pos_grid = resize2d(pos_grid, (gh, gw), "bilinear",
                            align_corners=False)
        pos_grid = pos_grid.reshape(1, gh * gw, cfg.embed_dim)
        tokens = tokens + jnp.concatenate([pos_cls, pos_grid], axis=1)

        taps = []
        for i in range(cfg.depth):
            tokens = ViTBlock(cfg.embed_dim, cfg.num_heads, cfg.mlp_ratio,
                              dtype=self.dtype, name=f"block{i}")(tokens)
            if i in cfg.hooks[2:]:
                taps.append(tokens)
        return (f4, f8), taps, (gh, gw)


class Reassemble(nn.Module):
    """DPT reassembly for one tap (backbones/utils.py:144-249): 'project'
    readout folds the cls token into every patch token, then a 1x1 conv and
    a per-tap spatial resize restore a feature map."""

    out_channels: int
    scale: int          # 4: x4 up, 2: x2 up, 1: identity, -2: /2 down
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, grid: Tuple[int, int]
                 ) -> jnp.ndarray:
        B, N, C = tokens.shape
        gh, gw = grid
        cls, patches = tokens[:, :1], tokens[:, 1:]
        readout = jnp.concatenate(
            [patches, jnp.broadcast_to(cls, patches.shape)], axis=-1)
        h = nn.Dense(C, dtype=self.dtype, name="readout_project")(readout)
        h = nn.gelu(h, approximate=False)
        h = h.reshape(B, gh, gw, C)
        h = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name="project")(h)
        if self.scale == 4 or self.scale == 2:
            h = nn.ConvTranspose(
                self.out_channels, (self.scale, self.scale),
                strides=(self.scale, self.scale), padding="VALID",
                dtype=self.dtype, name="resize")(h)
        elif self.scale == -2:
            h = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], dtype=self.dtype,
                        name="resize")(h)
        return h


class ResidualConvUnitL(nn.Module):
    """blocks_large.ResidualConvUnit_custom with bn=False."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = nn.relu(x)
        out = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                      dtype=self.dtype, name="conv1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                      dtype=self.dtype, name="conv2")(out)
        return out + x


class FusionBlockL(nn.Module):
    """blocks_large.FeatureFusionBlock_custom with explicit target size
    (upsample to `size` or 2x, align_corners=True)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 skip: Optional[jnp.ndarray] = None,
                 size: Optional[Tuple[int, int]] = None) -> jnp.ndarray:
        out = x
        if skip is not None:
            out = out + ResidualConvUnitL(self.features, dtype=self.dtype,
                                          name="res_conf_unit1")(skip)
        out = ResidualConvUnitL(self.features, dtype=self.dtype,
                                name="res_conf_unit2")(out)
        target = size if size is not None else (2 * out.shape[-3],
                                                2 * out.shape[-2])
        out = resize2d(out, target, "bilinear", align_corners=True)
        return nn.Conv(self.features, (1, 1), dtype=self.dtype,
                       name="out_conv")(out)


class DPTScaleMapLearner(nn.Module):
    """The DPT-Large SML (dpt_depth.py:30-185).

    __call__(x, d) like ScaleMapLearner: x (N, H, W, 3) network input,
    d (N, H, W, 1) unnormalized aligned inverse depth."""

    config: DPTConfig = DPTConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, d: jnp.ndarray,
                 train: bool = False):
        cfg = self.config
        if cfg.backbone == "swin2":
            # hierarchical taps arrive as 4D maps at strides 4..32; no
            # readout/reassembly stage (swin_common.py:35-51 is a bare
            # unflatten), straight into the scratch layer_rn convs
            from riders_tpu.models.swin2 import Swin2Config, SwinV2Backbone
            maps = SwinV2Backbone(cfg.swin2 or Swin2Config(),
                                  dtype=self.dtype, name="pretrained")(x)
        elif cfg.backbone == "vit_hybrid":
            # dpt_hybrid (vitb_rn50_384): the first two taps are raw
            # ResNetV2 stage maps, the last two are transformer hooks
            # through readout reassembly at /16 and /32
            # (backbones/vit.py:150-190).
            (f4, f8), hooks, grid = HybridViTBackbone(
                cfg, dtype=self.dtype, name="pretrained")(x)
            maps = [f4, f8] + [
                Reassemble(cfg.reassemble_channels[i + 2], (1, -2)[i],
                           dtype=self.dtype, name=f"reassemble{i + 3}")(
                               tokens, grid)
                for i, tokens in enumerate(hooks)]
        elif cfg.backbone == "next_vit":
            # next_vit_large_6m (backbones/next_vit.py): 4 hierarchical
            # conv-map hooks at strides 4..32, no readout/reassembly -
            # straight into the scratch convs (forward_next_vit:11-12).
            from riders_tpu.models.next_vit import (NextViTBackbone,
                                                    NextViTConfig)
            maps = NextViTBackbone(cfg.next_vit or NextViTConfig(),
                                   dtype=self.dtype, name="pretrained")(x)
        elif cfg.backbone == "levit":
            # levit_384 (backbones/levit.py): 3 hierarchical hooks, no
            # readout/reassembly - transpose+unflatten straight into the
            # scratch convs (forward_levit:9-20).
            from riders_tpu.models.levit import LeViTBackbone, LeViTConfig
            maps = LeViTBackbone(cfg.levit or LeViTConfig(),
                                 dtype=self.dtype, name="pretrained")(x)
        else:
            taps, grid = ViTBackbone(cfg, dtype=self.dtype,
                                     name="pretrained")(x)
            scales4 = (4, 2, 1, -2)
            maps = [
                Reassemble(cfg.reassemble_channels[i], scales4[i],
                           dtype=self.dtype, name=f"reassemble{i + 1}")(
                               tokens, grid)
                for i, tokens in enumerate(taps)]

        feats = []
        for i, h in enumerate(maps):
            h = nn.Conv(cfg.features, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=False, dtype=self.dtype,
                        name=f"layer{i + 1}_rn")(h)
            feats.append(h)

        if len(feats) == 3:
            # 3-layer decode (dpt_depth.py:131-139): refinenet3 opens the
            # path (no deeper skip).
            l1, l2, l3 = feats
            p3 = FusionBlockL(cfg.features, dtype=self.dtype,
                              name="refinenet3")(l3, size=l2.shape[-3:-1])
        else:
            l1, l2, l3, l4 = feats
            p4 = FusionBlockL(cfg.features, dtype=self.dtype,
                              name="refinenet4")(l4, size=l3.shape[-3:-1])
            p3 = FusionBlockL(cfg.features, dtype=self.dtype,
                              name="refinenet3")(p4, l3,
                                                 size=l2.shape[-3:-1])
        p2 = FusionBlockL(cfg.features, dtype=self.dtype,
                          name="refinenet2")(p3, l2, size=l1.shape[-3:-1])
        p1 = FusionBlockL(cfg.features, dtype=self.dtype,
                          name="refinenet1")(p2, l1)

        if cfg.backbone == "levit":
            # stem_b4_transpose(features, features//2, hard_swish)
            # (dpt_depth.py:99, backbones/levit.py:88-99): two
            # ConvTranspose3x3/s2 (torch output_padding=0 -> 2i-1) with
            # folded BN, each followed by hard-swish.
            for j, c in enumerate((cfg.features // 2, cfg.features // 4)):
                p1 = nn.ConvTranspose(
                    c, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name=f"stem_transpose_conv{j}")(p1)
                p1 = nn.hard_swish(p1)

        # Output head (dpt_depth.py:169-177): conv3 -> x2 bilinear (ac=True)
        # -> conv3 -> relu -> conv1 -> relu (non_negative).  Channel plan
        # head_features_1 -> /2 -> head_features_2 -> 1 (the levit config
        # narrows these to 64/8, dpt_depth.py:166-176 kwargs).
        hf1 = cfg.head_features_1 or cfg.features
        h = nn.Conv(hf1 // 2, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name="head_conv1")(p1)
        h = resize2d(h, (2 * h.shape[-3], 2 * h.shape[-2]), "bilinear",
                     align_corners=True)
        h = nn.Conv(cfg.head_features_2, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name="head_conv2")(h)
        h = nn.relu(h)
        out = nn.Conv(1, (1, 1), dtype=self.dtype, name="head_conv3")(h)
        out = nn.relu(out.astype(jnp.float32))

        if cfg.backbone == "levit" and out.shape[-3:-1] != d.shape[-3:-1]:
            # stem_b4_transpose's ConvTranspose2d(3, 2, 1) quirk
            # (output_padding=0 -> 2i-1) lands the levit head at
            # 2*(2*(2g-1)-1) pixels, short of the net shape; the
            # reference's own `pred = d * scales` (dpt_depth.py:146-149)
            # would shape-error here - it never instantiates levit - so
            # align the scale map to the prior with the family's
            # align_corners=True bilinear convention.
            out = resize2d(out, d.shape[-3:-1], "bilinear",
                           align_corners=True)

        scales = nn.relu(1.0 + out)
        pred = d.astype(jnp.float32) * scales
        if cfg.min_pred is not None and cfg.min_pred > 0:
            pred = jnp.minimum(pred, 1.0 / cfg.min_pred)
        if cfg.max_pred is not None:
            pred = jnp.maximum(pred, 1.0 / cfg.max_pred)
        return pred, scales
