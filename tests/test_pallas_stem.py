"""Interpret-mode parity tests for the fused Pallas stem kernel
(ops/pallas/stem.py) against the XLA conv+BN+leaky_relu path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from riders_tpu.ops.pallas.stem import stem_conv_pallas


def _xla_reference(image, kernel, scale, bias, k, slope=0.2):
    x = image.astype(jnp.bfloat16)
    pad = k // 2
    # the kernel folds the BN scale into the bf16 weights; fold here too so
    # the comparison isolates the im2col math from that rounding choice
    folded = (kernel * scale[None, None, None, :]).astype(jnp.bfloat16)
    y = jax.lax.conv_general_dilated(
        x, folded, (2, 2), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = y + bias[None, None, None, :]
    return jnp.maximum(y, slope * y).astype(jnp.bfloat16)


@pytest.mark.parametrize("k,H,W,Cout,TR", [
    (7, 96, 128, 32, 8),     # RC-Net stem geometry (scaled down)
    (7, 90, 122, 32, 16),    # odd output extents + ragged tail block
    (3, 64, 96, 16, 8),      # 3x3 stem (efficientnet-style)
])
def test_stem_kernel_matches_xla(rng, k, H, W, Cout, TR):
    B, Cin = 2, 3
    image = rng.standard_normal((B, H, W, Cin)).astype(np.float32)
    kernel = (rng.standard_normal((k, k, Cin, Cout)) * 0.2
              ).astype(np.float32)
    scale = (0.5 + rng.random(Cout)).astype(np.float32)
    bias = (rng.standard_normal(Cout) * 0.1).astype(np.float32)

    y_ref = _xla_reference(jnp.asarray(image), jnp.asarray(kernel),
                           jnp.asarray(scale), jnp.asarray(bias), k)
    Ho, Wo = y_ref.shape[1:3]
    y = stem_conv_pallas(
        jnp.asarray(image), jnp.asarray(kernel), jnp.asarray(scale),
        jnp.asarray(bias), k=k, block_rows=TR, interpret=True)

    assert y.shape[1] % TR == 0 and y.shape[1] >= Ho
    assert y.shape[2] == Wo and y.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y[:, :Ho], np.float32), np.asarray(y_ref, np.float32),
        rtol=0.02, atol=0.02)

    # padded-canvas mode: fill everywhere beyond (Ho, Wo), same values in
    # the valid region (the RoI kernel's _NEG convention)
    yp = stem_conv_pallas(
        jnp.asarray(image), jnp.asarray(kernel), jnp.asarray(scale),
        jnp.asarray(bias), k=k, block_rows=TR,
        pad_to=(Ho + 24, Wo + 16), interpret=True)
    assert yp.shape[1] >= Ho + 24 and yp.shape[2] == Wo + 16
    np.testing.assert_array_equal(np.asarray(yp[:, :Ho, :Wo]),
                                  np.asarray(y[:, :Ho]))
    tail = np.asarray(yp[:, Ho:], np.float32)
    side = np.asarray(yp[:, :, Wo:], np.float32)
    assert (tail <= -1e29).all() and (side <= -1e29).all()


def test_stem_kernel_tf_same_relu6(rng):
    """lead=0 (TF 'SAME' on even extents) + relu6 (slope 0, clip 6) - the
    efficientnet stem configuration."""
    B, H, W, Cin, Cout, k = 2, 64, 96, 3, 16, 3
    image = rng.standard_normal((B, H, W, Cin)).astype(np.float32)
    kernel = (rng.standard_normal((k, k, Cin, Cout)) * 0.5
              ).astype(np.float32)
    scale = (0.5 + rng.random(Cout)).astype(np.float32)
    bias = (rng.standard_normal(Cout) * 2.0).astype(np.float32)

    x = jnp.asarray(image).astype(jnp.bfloat16)
    folded = (jnp.asarray(kernel)
              * jnp.asarray(scale)[None, None, None, :]).astype(jnp.bfloat16)
    y_ref = jax.lax.conv_general_dilated(
        x, folded, (2, 2), [(0, 1), (0, 1)],          # TF SAME, even dims
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + jnp.asarray(bias)
    y_ref = jnp.minimum(jnp.maximum(y_ref, 0.0), 6.0)

    y = stem_conv_pallas(
        jnp.asarray(image), jnp.asarray(kernel), jnp.asarray(scale),
        jnp.asarray(bias), k=3, negative_slope=0.0, clip_max=6.0,
        lead=0, block_rows=8, interpret=True)[:, :H // 2]
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref, np.float32),
        rtol=0.02, atol=0.02)


@pytest.mark.parametrize("pool,pad_to", [
    (False, (0, 0)), (True, (64, 80)),
])
def test_stem_fold_w_matches_unfolded(rng, pool, pad_to):
    """fold_w emits the canvas (and fused pool) W-FOLDED - lane
    (w%4)*Cout + c - bit-identical to the unfolded form after an
    unfold reshape (PERF.md round 4: kills the canvas->flat relayout)."""
    B, H, W, Cin, Cout, k = 2, 70, 90, 3, 32, 7
    img = rng.standard_normal((B, H, W, Cin)).astype(np.float32)
    kern = (rng.standard_normal((k, k, Cin, Cout)) * 0.1).astype(np.float32)
    g = (0.5 + rng.random(Cout)).astype(np.float32)
    b = rng.standard_normal(Cout).astype(np.float32)

    args = (jnp.asarray(img), jnp.asarray(kern), jnp.asarray(g),
            jnp.asarray(b))
    ref = stem_conv_pallas(*args, k=k, pad_to=pad_to, pool=pool,
                           interpret=True)
    got = stem_conv_pallas(*args, k=k, pad_to=pad_to, pool=pool,
                           fold_w=True, interpret=True)
    if pool:
        ref, refp = ref
        got, gotp = got
    rr = np.asarray(ref, np.float32)
    gg = np.asarray(got, np.float32)
    Bc, R, OC, CL = gg.shape
    assert CL == 4 * Cout
    gu = gg.reshape(Bc, R, OC, 4, Cout).reshape(Bc, R, OC * 4, Cout)
    Ho, Wo = -(-H // 2), -(-W // 2)
    assert rr.shape[1] == R
    np.testing.assert_array_equal(gu[:, :, :Wo], rr[:, :, :Wo])
    if pool:
        rp = np.asarray(refp, np.float32)
        gp = np.asarray(gotp, np.float32)
        Bc, Hp, Wpq, CL = gp.shape
        gpu = gp.reshape(Bc, Hp, Wpq, 4, Cout).reshape(
            Bc, Hp, Wpq * 4, Cout)
        np.testing.assert_array_equal(gpu[:, :, :rp.shape[2]], rp)
