"""Parity tests for stage-1 alignment vs scipy/numpy references."""

import numpy as np
import pytest
from scipy.optimize import minimize_scalar

import jax
import jax.numpy as jnp

from riders_tpu.ops.alignment import (
    align_mono_prior,
    clamp_inverse_depth,
    optimize_scale,
    scale_shift_ls,
    validity_and_inverse,
)


def _np_scale_shift(pred, tgt, mask):
    a00 = np.sum(mask * pred * pred)
    a01 = np.sum(mask * pred)
    a11 = np.sum(mask)
    b0 = np.sum(mask * pred * tgt)
    b1 = np.sum(mask * tgt)
    det = a00 * a11 - a01 * a01
    if det <= 0:
        return 0.0, 0.0
    return ((a11 * b0 - a01 * b1) / det, (-a01 * b0 + a00 * b1) / det)


def test_scale_shift_ls_matches_numpy(rng):
    pred = rng.random((60, 80)).astype(np.float32)
    tgt = (2.5 * pred + 0.3).astype(np.float32)
    mask = (rng.random((60, 80)) > 0.97).astype(np.float32)
    s, t = scale_shift_ls(jnp.asarray(pred), jnp.asarray(tgt),
                          jnp.asarray(mask))
    s_ref, t_ref = _np_scale_shift(pred, tgt, mask)
    np.testing.assert_allclose(float(s), s_ref, rtol=1e-5)
    np.testing.assert_allclose(float(t), t_ref, rtol=1e-4, atol=1e-5)


def test_scale_shift_degenerate_returns_zero():
    pred = jnp.zeros((8, 8))
    s, t = scale_shift_ls(pred, pred, jnp.zeros((8, 8)))
    assert float(s) == 0.0 and float(t) == 0.0


@pytest.mark.parametrize("bounds", [(0.01, 0.3), (0.5, 1.6)])
def test_optimize_scale_matches_scipy(rng, bounds):
    # Synthetic: inverse-depth prior with a true scale inside the bounds.
    true_scale = 0.6 * (bounds[0] + bounds[1])
    pred = (rng.random((48, 64)) + 0.1).astype(np.float32)
    tgt = (true_scale * pred).astype(np.float32)
    noise = rng.normal(0, 0.01, tgt.shape).astype(np.float32)
    tgt = tgt + noise
    mask = (rng.random((48, 64)) > 0.95).astype(np.float32)

    def objective(s):
        return np.sum(mask * np.abs(s * pred - tgt))

    ref = minimize_scalar(objective, bounds=bounds).x
    ours = float(optimize_scale(jnp.asarray(pred), jnp.asarray(tgt),
                                jnp.asarray(mask), bounds))
    assert abs(ours - ref) < 1e-4
    assert abs(ours - true_scale) < 0.02


def test_optimize_scale_vmappable(rng):
    pred = rng.random((4, 16, 16)).astype(np.float32)
    tgt = 0.1 * pred
    mask = np.ones_like(pred)
    scales = jax.vmap(
        lambda p, t, m: optimize_scale(p, t, m, (0.01, 0.3)))(
            jnp.asarray(pred), jnp.asarray(tgt), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(scales), 0.1, atol=1e-5)


def test_optimize_scale_dense_beyond_bucket(rng):
    """>512 valid pixels: without a proven bound the solve must use the
    exact dense objective, not silently truncate to the gather bucket
    (round-2 VERDICT weak #7)."""
    true_scale = 0.17
    pred = (rng.random((64, 64)) + 0.1).astype(np.float32)   # 4096 px
    tgt = (true_scale * pred).astype(np.float32)
    # ~1500 valid pixels; make the FIRST 512 flat indices misleading by
    # corrupting their targets, so bucket truncation would land wrong.
    mask = (rng.random((64, 64)) > 0.6).astype(np.float32)
    assert mask.sum() > 512
    # Corrupt exactly the first 520 valid pixels (the gather bucket's
    # worth) but keep them a minority so the exact optimum stays ~0.17
    # while bucket truncation would land ~0.29.
    cut = int(np.searchsorted(np.cumsum(mask.reshape(-1)), 520)) + 1
    flat_tgt = tgt.reshape(-1)
    flat_tgt[:cut] = 0.29 * pred.reshape(-1)[:cut]
    tgt = flat_tgt.reshape(64, 64)

    def objective(s):
        return np.sum(mask * np.abs(s * pred - tgt))

    ref = minimize_scalar(objective, bounds=(0.01, 0.3)).x
    ours = float(optimize_scale(jnp.asarray(pred), jnp.asarray(tgt),
                                jnp.asarray(mask), (0.01, 0.3)))
    assert abs(ours - ref) < 1e-4

    # With a (false) static bound the gathered path would differ - the
    # guard is that the DEFAULT path is the exact one.
    trunc = float(optimize_scale(jnp.asarray(pred), jnp.asarray(tgt),
                                 jnp.asarray(mask), (0.01, 0.3),
                                 max_valid=512))
    assert abs(trunc - ref) > 1e-3  # documents why the bound must be real


def test_optimize_scale_gathered_exact_when_bounded(rng):
    """A provable sparse bound keeps the fast gathered path exact."""
    pred = (rng.random((64, 64)) + 0.1).astype(np.float32)
    tgt = (0.2 * pred).astype(np.float32)
    mask = np.zeros((64, 64), np.float32)
    idx = rng.choice(64 * 64, 40, replace=False)
    mask.reshape(-1)[idx] = 1.0
    dense = float(optimize_scale(jnp.asarray(pred), jnp.asarray(tgt),
                                 jnp.asarray(mask), (0.01, 0.3)))
    gathered = float(optimize_scale(jnp.asarray(pred), jnp.asarray(tgt),
                                    jnp.asarray(mask), (0.01, 0.3),
                                    max_valid=64))
    assert abs(dense - gathered) < 1e-6


def test_clamp_inverse_depth():
    x = jnp.asarray([0.001, 0.5, 100.0])
    out = clamp_inverse_depth(x, clamp_min=0.1, clamp_max=255.0)
    # inv <= 1/0.1 = 10; inv >= 1/255
    np.testing.assert_allclose(np.asarray(out),
                               [1.0 / 255.0, 0.5, 10.0], rtol=1e-6)
    # clamp_min=0 is skipped (reference estimator.py:121-122).
    out2 = clamp_inverse_depth(x, clamp_min=0.0, clamp_max=None)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(x))


def test_validity_and_inverse():
    depth = jnp.asarray([[0.0, 5.0, 150.0, 2.0]])
    inv, valid = validity_and_inverse(depth, 0.0, 100.0)
    np.testing.assert_allclose(np.asarray(valid), [[0, 1, 0, 1]])
    np.testing.assert_allclose(np.asarray(inv), [[0.0, 0.2, 0.0, 0.5]])


def test_align_mono_prior_end_to_end(rng):
    # A frame whose mono prior is exactly 1/0.05 of the radar inverse depth.
    mono = (rng.random((60, 80)) * 0.5 + 0.2).astype(np.float32)
    depth = np.zeros((60, 80), np.float32)
    pts = rng.integers(0, 60 * 80, 40)
    flat = depth.reshape(-1)
    flat[pts] = 1.0 / (0.05 * mono.reshape(-1)[pts])
    tgt_inv, valid = validity_and_inverse(jnp.asarray(depth), 0.0, 1000.0)
    out = align_mono_prior(jnp.asarray(mono), tgt_inv, valid,
                           mode="s", mono_type="inv",
                           min_pred=0.1, max_pred=255.0)
    # Aligned inverse depth at the radar points should match the target.
    np.testing.assert_allclose(
        np.asarray(out).reshape(-1)[pts],
        np.asarray(tgt_inv).reshape(-1)[pts], rtol=1e-3)
