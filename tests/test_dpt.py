"""Smoke tests for the DPT-Large SML variant."""
import dataclasses

import pytest



import numpy as np

import jax
import jax.numpy as jnp

from riders_tpu.models.dpt import DPTConfig, DPTScaleMapLearner


def tiny_dpt():
    return DPTConfig(net_shape=(64, 96), embed_dim=64, depth=4,
                     num_heads=4, hooks=(0, 1, 2, 3),
                     reassemble_channels=(16, 32, 64, 64), features=32,
                     pretrained_grid=6)


def test_dpt_forward_shapes_and_clamps(rng):
    cfg = tiny_dpt()
    model = DPTScaleMapLearner(config=cfg)
    h, w = cfg.net_shape
    x = jnp.asarray(rng.standard_normal((2, h, w, 3)).astype(np.float32))
    d = jnp.asarray((rng.random((2, h, w, 1)) * 5).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, d)
    pred, scales = model.apply(variables, x, d)
    assert pred.shape == (2, h, w, 1)
    p = np.asarray(pred)
    assert np.isfinite(p).all()
    assert p.max() <= 1.0 / cfg.min_pred + 1e-5
    assert p.min() >= 1.0 / cfg.max_pred - 1e-7
    # head relu + relu(1+out): DPT scales are >= 1
    assert np.asarray(scales).min() >= 1.0 - 1e-6


@pytest.mark.slow
def test_dpt_pos_embed_resizes_to_input(rng):
    """Different input sizes reuse the same params (pos embed resized at
    trace time, backbones/vit.py:16-31)."""
    cfg = tiny_dpt()
    model = DPTScaleMapLearner(config=cfg)
    x1 = jnp.zeros((1, 64, 96, 3))
    d1 = jnp.ones((1, 64, 96, 1))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x1, d1)
    x2 = jnp.zeros((1, 96, 64, 3))
    d2 = jnp.ones((1, 96, 64, 1))
    pred, _ = model.apply(variables, x2, d2)
    assert pred.shape == (1, 96, 64, 1)


def test_dpt_param_count():
    cfg = DPTConfig()   # full ViT-L
    model = DPTScaleMapLearner(config=cfg)
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 512, 672, 3)), jnp.ones((1, 512, 672, 1)))
    n = sum(np.prod(s.shape) for s in
            jax.tree_util.tree_leaves(shapes["params"]))
    # ViT-L/16 is ~304M; DPT adds ~40M of reassembly/fusion.
    assert 2.8e8 < n < 4.0e8, n


@pytest.mark.slow
def test_beit_backbone_forward(rng):
    cfg = tiny_dpt()
    cfg = dataclasses.replace(cfg, backbone="beit")
    model = DPTScaleMapLearner(config=cfg)
    h, w = cfg.net_shape
    x = jnp.asarray(rng.standard_normal((1, h, w, 3)).astype(np.float32))
    d = jnp.asarray((rng.random((1, h, w, 1)) * 5).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, d)
    # BEiT has no absolute pos embed but per-block rel-pos tables + gammas
    assert "pos_embed" not in variables["params"]["pretrained"]
    blk = variables["params"]["pretrained"]["block0"]
    assert "gamma_1" in blk and "rel_pos_bias_table" in blk["attn"]
    pred, scales = model.apply(variables, x, d)
    assert pred.shape == (1, h, w, 1)
    assert np.isfinite(np.asarray(pred)).all()


def test_beit_rel_pos_index_properties():
    from riders_tpu.models.dpt import _beit_rel_pos_index
    idx = np.asarray(_beit_rel_pos_index(3, 4))
    n = 3 * 4
    num_rel = 5 * 7
    assert idx.shape == (n + 1, n + 1)
    assert idx[0, 0] == num_rel
    assert (idx[0, 1:] == num_rel + 1).all()
    assert (idx[1:, 0] == num_rel + 2).all()
    # zero displacement maps every diagonal token pair to the same entry
    assert len(set(np.diag(idx)[1:])) == 1
    assert idx.max() == num_rel + 2
    assert idx[1:, 1:].max() < num_rel


def test_swin_v1_backbone_forward(rng):
    """Swin V1 (swinl12_384 semantics): pre-norm blocks, learned rel-pos
    tables, norm-first patch merging - tiny plan forward."""
    from riders_tpu.models.swin2 import Swin2Config, SwinV2Backbone

    cfg = Swin2Config(embed_dim=16, depths=(1, 2, 1, 1),
                      num_heads=(1, 2, 4, 8), window_size=4, version=1)
    model = SwinV2Backbone(cfg)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    taps = model.apply(variables, x)
    assert [t.shape for t in taps] == [
        (1, 16, 16, 16), (1, 8, 8, 32), (1, 4, 4, 64), (1, 2, 2, 128)]
    assert all(np.isfinite(np.asarray(t)).all() for t in taps)
    # v1 parameter structure: learned tables + full qkv bias, no cpb/logit
    blk = variables["params"]["stage0_block0"]["attn"]
    assert "rel_pos_bias_table" in blk and "qkv" in blk
    assert "logit_scale" not in blk and "cpb_fc1" not in blk


@pytest.mark.slow
def test_dpt_hybrid_forward(rng):
    """dpt_hybrid (vitb_rn50_384): ResNetV2 taps at /4 and /8, token
    hooks at /16 and /32; full pyramid through the scratch."""
    import dataclasses as _dc

    from riders_tpu.models.dpt import (DPTConfig, DPTScaleMapLearner,
                                       HybridViTBackbone, ResNetV2Stages)

    cfg = DPTConfig(net_shape=(96, 96), backbone="vit_hybrid",
                    embed_dim=64, depth=2, num_heads=2,
                    hooks=(0, 1, 0, 1),
                    reassemble_channels=(256, 512, 64, 64),
                    pretrained_grid=6)

    x = jnp.asarray(rng.standard_normal((1, 96, 96, 3)).astype(np.float32))
    bb = HybridViTBackbone(cfg)
    variables = bb.init(jax.random.PRNGKey(0), x)
    (f4, f8), taps, grid = bb.apply(variables, x)
    assert f4.shape == (1, 24, 24, 256)
    assert f8.shape == (1, 12, 12, 512)
    assert grid == (6, 6) and len(taps) == 2
    assert taps[0].shape == (1, 37, 64)

    model = DPTScaleMapLearner(config=cfg)
    d = jnp.asarray((rng.random((1, 96, 96, 1)) * 20).astype(np.float32))
    mv = model.init(jax.random.PRNGKey(1), x, d)
    pred, scales = model.apply(mv, x, d)
    assert pred.shape == (1, 96, 96, 1)
    assert np.isfinite(np.asarray(pred)).all()


def test_factory_builds_every_dpt_family():
    """Every DPT_FAMILIES row (plus dpt-hybrid) must build a module."""
    import dataclasses as _dc

    from riders_tpu.core.config import zju_config
    from riders_tpu.models.factory import DPT_FAMILIES, build_sml_model

    cfg = zju_config()
    for model_type in list(DPT_FAMILIES) + ["dpt-hybrid"]:
        mcfg = cfg.replace(sml=_dc.replace(cfg.sml, model_type=model_type,
                                           net_shape=(384, 384)))
        model = build_sml_model(mcfg)
        assert model is not None, model_type
