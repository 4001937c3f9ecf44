"""SML model selection (train_zju.py:170-195 model_type switch; DPT
family table: modules/midas/blocks_large.py:33-131 + dpt_depth.py:51-64)."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from riders_tpu.core.config import RidersConfig, SMLConfig

# Per-family DPT settings (reference blocks_large.py rows).  Keys:
#   backbone, embed/depth/heads, hooks, reassemble channels, pretrained
#   grid (ViT/BEiT) or swin plan.
_VIT_L = dict(embed_dim=1024, depth=24, num_heads=16,
              hooks=(5, 11, 17, 23),
              reassemble_channels=(256, 512, 1024, 1024))
_VIT_B = dict(embed_dim=768, depth=12, num_heads=12,
              hooks=(2, 5, 8, 11),
              reassemble_channels=(96, 192, 384, 768))

DPT_FAMILIES = {
    # model_type            backbone   dims     pretrained_grid
    "dpt-large":           ("vit", _VIT_L, 24, None),   # vitl16_384
    "dpt-vit-base":        ("vit", _VIT_B, 24, None),   # vitb16_384
    "dpt-beit-large":      ("beit", _VIT_L, 32, None),  # beitl16_512
    "dpt-beit-large-384":  ("beit", _VIT_L, 24, None),  # beitl16_384
    "dpt-beit-base":       ("beit", _VIT_B, 24, None),  # beitb16_384
    "dpt-swin2-large":     ("swin2", None, 24, "large"),    # swin2l24_384
    "dpt-swin2-base":      ("swin2", None, 24, "base"),     # swin2b24_384
    "dpt-swin2-tiny":      ("swin2", None, 16, "tiny"),     # swin2t16_256
    "dpt-swin-large":      ("swin2", None, 12, "v1-large"), # swinl12_384
    "dpt-levit-224":       ("levit", None, 14, None),       # levit_384
    "dpt-next-vit-large":  ("next_vit", None, 24, None),    # next_vit_large_6m
}


def _swin_plan(name: str):
    from riders_tpu.models.swin2 import SWIN1_LARGE, Swin2Config
    if name == "large":
        return Swin2Config(), (192, 384, 768, 1536)
    if name == "base":
        return Swin2Config(embed_dim=128, num_heads=(4, 8, 16, 32)), \
            (128, 256, 512, 1024)
    if name == "tiny":
        return Swin2Config(embed_dim=96, depths=(2, 2, 6, 2),
                           num_heads=(3, 6, 12, 24), window_size=16,
                           pretrained_window_sizes=(8, 8, 8, 4)), \
            (96, 192, 384, 768)
    if name == "v1-large":
        return SWIN1_LARGE, (192, 384, 768, 1536)
    raise ValueError(name)


def build_sml_model(cfg: RidersConfig, dtype=jnp.float32):
    """Instantiate the configured Scale Map Learner variant.

    'midas-small'       -> ScaleMapLearner (scale regression)
    'midas-small-depth' -> ScaleMapLearner with direct depth regression
                           (MidasNet_small_depth, midas_net_custom.py:136)
    'dpt-*'             -> DPTScaleMapLearner; see DPT_FAMILIES for the
                           full backbone matrix (ViT-L/B, BEiT-L-512/
                           L-384/B, SwinV2-L/B/T, Swin-V1-L) and
                           'dpt-hybrid' (ResNet50 + ViT-B).
    """
    sml: SMLConfig = cfg.sml
    if sml.model_type in ("midas-small", "midas-small-depth"):
        from riders_tpu.models.sml import ScaleMapLearner
        if sml.model_type == "midas-small-depth":
            sml = dataclasses.replace(sml, regress_mode="depth")
        return ScaleMapLearner(config=sml, dtype=dtype)
    if sml.model_type == "dpt-hybrid":
        from riders_tpu.models.dpt import DPTConfig, DPTScaleMapLearner
        dcfg = DPTConfig(net_shape=sml.net_shape, backbone="vit_hybrid",
                         embed_dim=768, depth=12, num_heads=12,
                         hooks=(0, 1, 8, 11),
                         reassemble_channels=(256, 512, 768, 768),
                         pretrained_grid=24, in_channels=sml.in_channels,
                         min_pred=sml.min_pred, max_pred=sml.max_pred)
        return DPTScaleMapLearner(config=dcfg, dtype=dtype)
    if sml.model_type in DPT_FAMILIES:
        from riders_tpu.models.dpt import DPTConfig, DPTScaleMapLearner
        backbone, dims, grid, swin = DPT_FAMILIES[sml.model_type]
        kw = dict(dims) if dims else {}
        if swin is not None:
            plan, in_feats = _swin_plan(swin)
            kw["swin2"] = plan
            kw["reassemble_channels"] = in_feats
        if backbone == "next_vit":
            # 4 conv-map hooks, scratch channels per dpt_depth.py:66-69.
            from riders_tpu.models.next_vit import NextViTConfig
            kw["next_vit"] = NextViTConfig()
            kw["hooks"] = (2, 6, 36, 39)
            kw["reassemble_channels"] = (96, 256, 512, 1024)
        if backbone == "levit":
            # 3-hook hierarchical decode with the narrow head
            # (dpt_depth.py:60,96-99 + the levit_384 scratch row
            # blocks_large.py:90-96)
            from riders_tpu.models.levit import LeViTConfig
            kw["levit"] = LeViTConfig()
            kw["hooks"] = (3, 11, 21)
            kw["reassemble_channels"] = (384, 512, 768)
            kw["head_features_1"] = 64
            kw["head_features_2"] = 8
        dcfg = DPTConfig(net_shape=sml.net_shape, backbone=backbone,
                         pretrained_grid=grid,
                         in_channels=sml.in_channels,
                         min_pred=sml.min_pred, max_pred=sml.max_pred,
                         **kw)
        return DPTScaleMapLearner(config=dcfg, dtype=dtype)
    raise ValueError(f"Unknown SML model_type: {sml.model_type}")
