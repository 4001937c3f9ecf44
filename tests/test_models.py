"""Smoke + structural tests for the SML and RC-Net flax models."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from riders_tpu.core.config import RCNetConfig, SMLConfig
from riders_tpu.models.attention import (
    LocalFeatureTransformer,
    linear_attention,
)
from riders_tpu.models.rcnet import RCNet, ResNetEncoder
from riders_tpu.models.sml import ScaleMapLearner


def test_linear_attention_matches_torch_reference(rng):
    """Parity with the elu+1 linear attention einsum semantics
    (RCNet/linear_attention.py:18-45)."""
    import torch
    import torch.nn.functional as F

    n, l, s, h, d = 2, 21, 21, 8, 16
    q = rng.standard_normal((n, l, h, d)).astype(np.float32)
    k = rng.standard_normal((n, s, h, d)).astype(np.float32)
    v = rng.standard_normal((n, s, h, d)).astype(np.float32)

    tq, tk, tv = map(torch.from_numpy, (q, k, v))
    Q = F.elu(tq) + 1
    K = F.elu(tk) + 1
    values = tv / s
    KV = torch.einsum("nshd,nshv->nhdv", K, values)
    Z = 1 / (torch.einsum("nlhd,nhd->nlh", Q, K.sum(dim=1)) + 1e-6)
    ref = torch.einsum("nlhd,nhdv,nlh->nlhv", Q, KV, Z) * s

    ours = linear_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


def test_linear_attention_flat_matches_head_split(rng):
    """The flat block-diagonal formulation (the TPU fast path inside
    LoFTREncoderLayer) equals the explicit (N, L, H, D) head split."""
    from riders_tpu.models.attention import linear_attention_flat

    n, l, s, h, d = 3, 21, 17, 8, 16
    q = rng.standard_normal((n, l, h * d)).astype(np.float32)
    k = rng.standard_normal((n, s, h * d)).astype(np.float32)
    v = rng.standard_normal((n, s, h * d)).astype(np.float32)
    qm = (rng.random((n, l)) > 0.3).astype(np.float32)
    km = (rng.random((n, s)) > 0.3).astype(np.float32)

    ref = linear_attention(
        jnp.asarray(q).reshape(n, l, h, d), jnp.asarray(k).reshape(n, s, h, d),
        jnp.asarray(v).reshape(n, s, h, d), jnp.asarray(qm),
        jnp.asarray(km)).reshape(n, l, h * d)
    got = linear_attention_flat(jnp.asarray(q), jnp.asarray(k),
                                jnp.asarray(v), h, jnp.asarray(qm),
                                jnp.asarray(km))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_loftr_stack_shapes(rng):
    model = LocalFeatureTransformer(d_model=32, nhead=4, n_layers=2)
    f0 = jnp.asarray(rng.standard_normal((3, 21, 32)).astype(np.float32))
    f1 = jnp.asarray(rng.standard_normal((3, 21, 32)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), f0, f1)
    o0, o1 = model.apply(params, f0, f1)
    assert o0.shape == f0.shape and o1.shape == f1.shape
    assert np.isfinite(np.asarray(o0)).all()


def test_resnet_encoder_shapes(rng):
    enc = ResNetEncoder()
    x = jnp.asarray(rng.standard_normal((1, 256, 320, 3)).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), x)
    latent, skips = enc.apply(params, x)
    assert latent.shape == (1, 8, 10, 128)
    assert [tuple(s.shape) for s in skips] == [
        (1, 128, 160, 32), (1, 64, 80, 64), (1, 32, 40, 128),
        (1, 16, 20, 128)]


def test_sml_forward_shapes_and_clamps(rng):
    cfg = SMLConfig(net_shape=(96, 128), min_pred=0.1, max_pred=255.0)
    model = ScaleMapLearner(config=cfg)
    x = jnp.asarray(rng.standard_normal((2, 96, 128, 3)).astype(np.float32))
    d = jnp.asarray((rng.random((2, 96, 128, 1)) * 20).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, d)
    pred, scales = model.apply(variables, x, d)
    assert pred.shape == (2, 96, 128, 1)
    assert scales.shape == (2, 96, 128, 1)
    p = np.asarray(pred)
    assert p.max() <= 1.0 / 0.1 + 1e-5
    assert p.min() >= 1.0 / 255.0 - 1e-7
    assert np.isfinite(p).all()
    # scales = relu(1 + out) must be non-negative
    assert np.asarray(scales).min() >= 0.0


def test_output_conv_fast_upsample_matches_naive(rng):
    """The phase-composed output head (OutputConv.fast_upsample) must match
    the literal resize->conv->relu->conv formulation, including the
    clamped-upsample/zero-pad borders, at f32 precision."""
    from riders_tpu.models.sml import OutputConv

    for (n, m) in ((72, 88), (15, 21)):
        x = jnp.asarray(rng.standard_normal((2, n, m, 64)).astype(np.float32))
        naive = OutputConv(features=64, fast_upsample=False)
        fast = OutputConv(features=64, fast_upsample=True)
        variables = naive.init(jax.random.PRNGKey(0), x)
        ref = naive.apply(variables, x)
        out = fast.apply(variables, x)
        assert out.shape == ref.shape == (2, 2 * n, 2 * m, 1)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)


def test_upconv_fast_2x_matches_naive(rng):
    """The phase-composed nearest-x2 upsample+conv (UpConvBlock.fast_2x)
    must match the literal resize->conv formulation exactly, including
    borders, BN and activation."""
    from riders_tpu.models.layers import UpConvBlock, activation_fn

    act = activation_fn("leaky_relu")
    x = jnp.asarray(rng.standard_normal((2, 9, 7, 12)).astype(np.float32))
    naive = UpConvBlock(16, 3, act, True, fast_2x=False)
    fast = UpConvBlock(16, 3, act, True, fast_2x=True)
    variables = naive.init(jax.random.PRNGKey(0), x, (18, 14))
    # non-trivial BN stats
    stats = jax.tree_util.tree_map(lambda a: a, variables["batch_stats"])
    stats["conv"]["bn"]["mean"] = jnp.asarray(
        rng.standard_normal(16).astype(np.float32) * 0.1)
    stats["conv"]["bn"]["var"] = jnp.asarray(
        (0.5 + rng.random(16)).astype(np.float32))
    variables = {"params": variables["params"], "batch_stats": stats}

    ref = naive.apply(variables, x, (18, 14))
    out = fast.apply(variables, x, (18, 14))
    assert out.shape == ref.shape == (2, 18, 14, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)

    # non-x2 targets fall back to the naive path
    odd = fast.apply(variables, x, (19, 15))
    assert odd.shape == (2, 19, 15, 16)


def test_sml_param_structure():
    cfg = SMLConfig(net_shape=(96, 128))
    model = ScaleMapLearner(config=cfg)
    x = jnp.zeros((1, 96, 128, 3))
    d = jnp.ones((1, 96, 128, 1))
    variables = model.init(jax.random.PRNGKey(0), x, d)
    params = variables["params"]
    for key in ("first_conv", "pretrained", "layer1_rn", "layer4_rn",
                "refinenet4", "refinenet1", "output_conv"):
        assert key in params, f"missing {key}"
    n_params = sum(np.prod(p.shape) for p in
                   jax.tree_util.tree_leaves(params))
    # efficientnet-lite3 backbone ~7M; refinenet4 RCUs at 512ch ~9.4M; total ~16.6M.
    assert 10e6 < n_params < 25e6, n_params


@pytest.mark.parametrize(
    "batch,k",
    [(1, 4),
     # second full-RCNet compile ~30 s on one core: slow tier
     pytest.param(2, 3, marks=pytest.mark.slow)])
def test_rcnet_forward_shapes(rng, batch, k):
    cfg = RCNetConfig(patch_size=(64, 32))
    model = RCNet(config=cfg)
    H, W = 128, 160   # already-padded frame
    image = jnp.asarray(rng.random((batch, H, W, 3)).astype(np.float32))
    pts = np.stack([
        rng.integers(16, W - 16, (batch, k)),
        rng.integers(32, H - 32, (batch, k)),
        rng.random((batch, k)) * 50], axis=-1).astype(np.float32)
    boxes = np.stack([
        pts[..., 0] - 16, pts[..., 1] - 32,
        pts[..., 0] + 16, pts[..., 1] + 32], axis=-1).astype(np.float32)
    mask = np.ones((batch, k), np.float32)
    mask[:, -1] = 0.0

    variables = model.init(jax.random.PRNGKey(0), image, jnp.asarray(pts),
                           jnp.asarray(boxes), jnp.asarray(mask))
    logits = model.apply(variables, image, jnp.asarray(pts),
                         jnp.asarray(boxes), jnp.asarray(mask))
    assert logits.shape == (batch, k, 64, 32, 1)
    # masked points should produce strongly negative logits
    assert np.asarray(logits)[:, -1].max() <= -1e3

    probs = model.apply(variables, image, jnp.asarray(pts),
                        jnp.asarray(boxes), jnp.asarray(mask),
                        return_logits=False)
    pr = np.asarray(probs)
    assert pr.min() >= 0 and pr.max() <= 1
    assert pr[:, -1].max() == 0.0


def test_decoder_phase_tail_matches_literal(rng):
    """The phase-space decoder tail (x2 upconv + fusion conv + output conv
    composed at quarter resolution) must match the literal full-resolution
    path."""
    from riders_tpu.models.rcnet import MultiScaleDecoder

    def build(phase_tail):
        return MultiScaleDecoder(
            n_filters=(16, 16, 8), output_shape=(32, 32),
            output_channels=1, phase_tail=phase_tail)

    x = jnp.asarray(rng.standard_normal((3, 4, 4, 24)).astype(np.float32))
    skips = [jnp.asarray(rng.standard_normal((3, 16, 16, 8))
                         .astype(np.float32)),
             jnp.asarray(rng.standard_normal((3, 8, 8, 16))
                         .astype(np.float32))]
    variables = build(False).init(jax.random.PRNGKey(0), x, skips)
    # Perturb batch stats so BN folding is actually exercised.
    variables = jax.tree.map(
        lambda v: v + 0.1 * np.abs(rng.standard_normal(v.shape)).astype(
            v.dtype), variables)

    lit = build(False).apply(variables, x, skips)
    fast = build(True).apply(variables, x, skips)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(lit),
                               atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_rcnet_batchnorm_training_mode(rng):
    cfg = RCNetConfig(patch_size=(64, 32))
    model = RCNet(config=cfg)
    image = jnp.asarray(rng.random((1, 128, 160, 3)).astype(np.float32))
    pts = jnp.asarray(np.array([[[40, 60, 10.0]]], np.float32))
    boxes = jnp.asarray(np.array([[[24, 28, 56, 92]]], np.float32))
    variables = model.init(jax.random.PRNGKey(0), image, pts, boxes,
                           train=True)
    assert "batch_stats" in variables
    out, updates = model.apply(
        variables, image, pts, boxes, train=True,
        mutable=["batch_stats"])
    assert "batch_stats" in updates


@pytest.mark.slow
def test_rcnet_multiresolution_outputs(rng):
    """n_resolution>1 (networks.py:678-778): the decoder emits the
    deep->shallow logits list; the default return stays the
    full-resolution map (the reference wrapper's `[-1]`)."""
    cfg = RCNetConfig(patch_size=(64, 32), n_resolution=3)
    model = RCNet(config=cfg)
    B, K = 1, 2
    H, W = 128, 160
    image = jnp.asarray(rng.random((B, H, W, 3)).astype(np.float32))
    pts = np.stack([
        rng.integers(16, W - 16, (B, K)),
        rng.integers(32, H - 32, (B, K)),
        rng.random((B, K)) * 50], axis=-1).astype(np.float32)
    boxes = np.stack([
        pts[..., 0] - 16, pts[..., 1] - 32,
        pts[..., 0] + 16, pts[..., 1] + 32], axis=-1).astype(np.float32)
    mask = np.ones((B, K), np.float32)

    variables = model.init(jax.random.PRNGKey(0), image, jnp.asarray(pts),
                           jnp.asarray(boxes), jnp.asarray(mask))
    outs = model.apply(variables, image, jnp.asarray(pts),
                       jnp.asarray(boxes), jnp.asarray(mask),
                       return_all_scales=True)
    assert len(outs) == 3
    assert outs[-1].shape == (B, K, 64, 32, 1)
    # each scale doubles the previous one
    for a, b in zip(outs, outs[1:]):
        assert (2 * a.shape[2], 2 * a.shape[3]) == b.shape[2:4]
    # the default (single-output) path is the last scale
    last = model.apply(variables, image, jnp.asarray(pts),
                       jnp.asarray(boxes), jnp.asarray(mask))
    np.testing.assert_array_equal(np.asarray(last), np.asarray(outs[-1]))
