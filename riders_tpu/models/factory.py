"""SML model selection (train_zju.py:170-195 model_type switch)."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from riders_tpu.core.config import RidersConfig, SMLConfig


def build_sml_model(cfg: RidersConfig, dtype=jnp.float32):
    """Instantiate the configured Scale Map Learner variant.

    'midas-small'       -> ScaleMapLearner (scale regression)
    'midas-small-depth' -> ScaleMapLearner with direct depth regression
                           (MidasNet_small_depth, midas_net_custom.py:136)
    'dpt-large'         -> DPTScaleMapLearner (ViT-L/16 DPT)
    'dpt-beit-large'    -> DPTScaleMapLearner (BEiT-L/16-512)
    'dpt-swin2-large'   -> DPTScaleMapLearner (SwinV2-L window 24)
    """
    sml: SMLConfig = cfg.sml
    if sml.model_type in ("midas-small", "midas-small-depth"):
        from riders_tpu.models.sml import ScaleMapLearner
        if sml.model_type == "midas-small-depth":
            sml = dataclasses.replace(sml, regress_mode="depth")
        return ScaleMapLearner(config=sml, dtype=dtype)
    if sml.model_type in ("dpt-large", "dpt-beit-large",
                          "dpt-swin2-large"):
        from riders_tpu.models.dpt import DPTConfig, DPTScaleMapLearner
        backbone = ("beit" if "beit" in sml.model_type
                    else "swin2" if "swin2" in sml.model_type else "vit")
        dcfg = DPTConfig(net_shape=sml.net_shape, backbone=backbone,
                         pretrained_grid=32 if backbone == "beit" else 24,
                         in_channels=sml.in_channels,
                         min_pred=sml.min_pred, max_pred=sml.max_pred)
        return DPTScaleMapLearner(config=dcfg, dtype=dtype)
    raise ValueError(f"Unknown SML model_type: {sml.model_type}")
