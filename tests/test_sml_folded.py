"""Parity: the W-folded SML forward == the literal module forward.

The folded path (models/sml_folded.py) is an exact re-layout of the
same linear ops (ops/fold.py docstring: same products, f32 accumulation,
plus exact zeros), so f32 agreement is to float-associativity noise and
bf16 agreement to a couple of ulps.  Tested at both production net
shapes (288x384 ZJU, 288x352 NTU) via scaled-down geometry with the
same divisibility structure, plus primitive-level fold checks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from riders_tpu.core.config import SMLConfig
from riders_tpu.models.sml import ScaleMapLearner
from riders_tpu.models import sml_folded
from riders_tpu.ops import fold


def test_fold_unfold_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).random((2, 6, 16, 3)),
                    jnp.float32)
    xf = fold.fold_w(x, 4)
    assert xf.shape == (2, 6, 4, 12)
    # lane convention: x_f[..., w', f*C+c] == x[..., 4w'+f, c]
    np.testing.assert_array_equal(np.asarray(xf)[0, 0, 1, 2 * 3 + 1],
                                  np.asarray(x)[0, 0, 4 + 2, 1])
    np.testing.assert_array_equal(np.asarray(fold.unfold_w(xf, 4)),
                                  np.asarray(x))
    np.testing.assert_array_equal(
        np.asarray(fold.refold_w(fold.refold_w(xf, 4, 8), 8, 4)),
        np.asarray(xf))


@pytest.mark.parametrize("stride,kernel,F_out", [
    (1, 3, 4), (2, 3, 4), (2, 5, 4), (1, 5, 2), (2, 3, 2)])
def test_folded_conv_matches_lax(stride, kernel, F_out):
    rng = np.random.default_rng(1)
    W, H, Ci, Co = 32, 10, 5, 7
    F_in = stride * F_out
    x = jnp.asarray(rng.standard_normal((2, H, W, Ci)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((kernel, kernel, Ci, Co)),
                    jnp.float32)
    pad_h = fold.tf_same_pads(H, kernel, stride)
    pad_w = fold.tf_same_pads(W, kernel, stride)
    ref = jax.lax.conv_general_dilated(
        x, k, (stride, stride), [pad_h, pad_w],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = fold.folded_conv(fold.fold_w(x, F_in), k, F_in=F_in,
                           F_out=F_out, stride=(stride, stride),
                           pad_h=pad_h, pad_w_left=pad_w[0])
    np.testing.assert_allclose(np.asarray(fold.unfold_w(got, F_out)),
                               np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("stride,kernel", [(1, 3), (2, 3), (1, 5), (2, 5)])
def test_folded_depthwise_matches_lax(stride, kernel):
    rng = np.random.default_rng(2)
    W, H, C, F_out = 32, 12, 6, 4
    F_in = stride * F_out
    x = jnp.asarray(rng.standard_normal((2, H, W, C)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((kernel, kernel, 1, C)),
                    jnp.float32)
    pad_h = fold.tf_same_pads(H, kernel, stride)
    pad_w = fold.tf_same_pads(W, kernel, stride)
    ref = jax.lax.conv_general_dilated(
        x, k, (stride, stride), [pad_h, pad_w], feature_group_count=C,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = fold.folded_depthwise(fold.fold_w(x, F_in), k, F_in=F_in,
                                F_out=F_out, stride=(stride, stride),
                                pad_h=pad_h, pad_w_left=pad_w[0])
    np.testing.assert_allclose(np.asarray(fold.unfold_w(got, F_out)),
                               np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_folded_pointwise_matches_matmul():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 4, 8, 5)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((5, 9)), jnp.float32)
    ref = jnp.einsum("bhwc,cd->bhwd", x, k)
    got = fold.unfold_w(fold.folded_pointwise(fold.fold_w(x, 4), k, 4), 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def _make_sml(dtype, net_shape):
    cfg = SMLConfig(net_shape=net_shape)
    sml = ScaleMapLearner(config=cfg, dtype=dtype)
    x = jnp.asarray(
        np.random.default_rng(4).random((1,) + net_shape + (3,)),
        jnp.float32)
    d = jnp.asarray(
        0.5 + np.random.default_rng(5).random((1,) + net_shape + (1,)),
        jnp.float32)
    variables = jax.jit(sml.init)(jax.random.PRNGKey(0), x, d)
    return sml, variables, x, d


@pytest.mark.parametrize("net_w", [96, 128])
def test_folded_sml_matches_module_f32(net_w):
    # 96 keeps /4..(F8 at /4) divisibility like 384; 128 like 352's
    # even-but-not-4 deep widths are exercised by the unfolded tail.
    sml, variables, x, d = _make_sml(jnp.float32, (64, net_w))
    ref_pred, ref_scales = sml.apply(variables, x, d)
    got_pred, got_scales = sml_folded.folded_sml_apply(sml, variables, x, d)
    np.testing.assert_allclose(np.asarray(got_scales),
                               np.asarray(ref_scales), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_pred), np.asarray(ref_pred),
                               rtol=2e-4, atol=2e-4)


def test_folded_sml_matches_module_bf16():
    sml, variables, x, d = _make_sml(jnp.bfloat16, (64, 96))
    ref_pred, _ = sml.apply(variables, x, d)
    got_pred, _ = sml_folded.folded_sml_apply(sml, variables, x, d)
    ref = np.asarray(ref_pred, np.float32)
    got = np.asarray(got_pred, np.float32)
    # bf16 activations round once per op boundary in both paths; the
    # fold changes accumulation order only, so agreement is a few ulps.
    np.testing.assert_allclose(got, ref, rtol=0.03, atol=0.05)
    assert np.median(np.abs(got - ref) / np.maximum(np.abs(ref), 1e-3)) < 5e-3


def test_supports_folding_gates(monkeypatch):
    sml = ScaleMapLearner(config=SMLConfig(), dtype=jnp.bfloat16)
    # opt-in: off without RIDERS_SML_FOLD=1 (measured negative result,
    # see models/sml_folded.py docstring)
    monkeypatch.delenv("RIDERS_SML_FOLD", raising=False)
    assert not sml_folded.supports_folding(sml, (288, 384))
    monkeypatch.setenv("RIDERS_SML_FOLD", "1")
    assert sml_folded.supports_folding(sml, (288, 384))
    assert sml_folded.supports_folding(sml, (288, 352))
    assert not sml_folded.supports_folding(sml, (288, 350))
    shrunk = ScaleMapLearner(config=SMLConfig(), dtype=jnp.bfloat16,
                             backbone_stages=((3, 1, 1, 24, 1),),
                             backbone_taps=(0,))
    assert not sml_folded.supports_folding(shrunk, (288, 384))
