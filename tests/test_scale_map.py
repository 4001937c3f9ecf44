"""Tests for scale-map synthesis vs a numpy transliteration of the
reference semantics (val_zju.py:171-179, train_zju.py:303-316)."""

import numpy as np

import jax.numpy as jnp

from riders_tpu.ops.scale_map import (
    grayscale,
    normalize_intermediate,
    normalize_unit_range,
    synthesize_scale_map,
)


def _np_reference(int_depth, sparse, sparse_valid, rcnet, rcnet_valid):
    scales = np.ones_like(int_depth)
    scales[rcnet_valid] = rcnet[rcnet_valid] / int_depth[rcnet_valid]
    scales[sparse_valid] = sparse[sparse_valid] / int_depth[sparse_valid]
    return (scales - scales.min()) / (scales.max() - scales.min())


def test_synthesis_matches_numpy(rng):
    h, w = 48, 64
    int_depth = (rng.random((h, w)) * 0.2 + 0.05).astype(np.float32)
    sparse = (rng.random((h, w)) * 0.2).astype(np.float32)
    rcnet = (rng.random((h, w)) * 0.2).astype(np.float32)
    sparse_valid = rng.random((h, w)) > 0.95
    rcnet_valid = rng.random((h, w)) > 0.7

    ref = _np_reference(int_depth, sparse, sparse_valid, rcnet, rcnet_valid)
    ours = synthesize_scale_map(
        jnp.asarray(int_depth), jnp.asarray(sparse),
        jnp.asarray(sparse_valid.astype(np.float32)),
        jnp.asarray(rcnet), jnp.asarray(rcnet_valid.astype(np.float32)))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-6)


def test_synthesis_without_rcnet(rng):
    h, w = 16, 16
    int_depth = np.full((h, w), 0.5, np.float32)
    sparse = np.zeros((h, w), np.float32)
    sparse[3, 4] = 0.25
    sparse[8, 9] = 1.0
    valid = (sparse > 0).astype(np.float32)
    out = np.asarray(synthesize_scale_map(
        jnp.asarray(int_depth), jnp.asarray(sparse), jnp.asarray(valid)))
    # ratios: 0.5 and 2.0; background 1.0 -> normalized (x-0.5)/1.5
    assert abs(out[3, 4] - 0.0) < 1e-6
    assert abs(out[8, 9] - 1.0) < 1e-6
    assert abs(out[0, 0] - (1.0 - 0.5) / 1.5) < 1e-6


def test_normalize_unit_range_guard():
    const = jnp.full((4, 4), 3.0)
    out = normalize_unit_range(const)
    np.testing.assert_allclose(np.asarray(out), 3.0)


def test_grayscale(rng):
    img = rng.random((8, 8, 3)).astype(np.float32)
    g = np.asarray(grayscale(jnp.asarray(img)))
    ref = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    np.testing.assert_allclose(g, ref, rtol=1e-6)


def test_normalize_intermediate():
    d, s = normalize_intermediate(jnp.asarray(0.729), jnp.asarray(0.404))
    assert abs(float(d)) < 1e-6 and abs(float(s)) < 1e-5
