"""Tests for the native C++ Delaunay interpolator (skipped when the
toolchain cannot build it)."""

import numpy as np
import pytest

from riders_tpu.io.native import delaunay_interpolate_native, load
from riders_tpu.ops.interp import delaunay_interpolate

pytestmark = pytest.mark.skipif(load() is None,
                                reason="native library unavailable")


def test_native_matches_scipy(rng):
    H, W = 120, 160
    depth = np.zeros((H, W), np.float32)
    idx = rng.choice(H * W, 250, replace=False)
    depth.reshape(-1)[idx] = (rng.random(250) * 60 + 1).astype(np.float32)

    native = delaunay_interpolate_native(depth)
    scipy_out = delaunay_interpolate(depth, use_native=False)

    inside = scipy_out > 0
    diff = np.abs(native[inside] - scipy_out[inside])
    # Identical except where cocircular grid points make the triangulation
    # ambiguous (both results are valid Delaunay interpolants there).
    assert np.mean(diff < 1e-3) > 0.99
    assert np.median(diff) < 1e-6
    # knots reproduce their values exactly
    r, c = np.where(depth > 0)
    np.testing.assert_allclose(native[r, c], depth[r, c], atol=1e-3)


def test_native_degenerate_inputs():
    out = delaunay_interpolate_native(np.zeros((16, 16), np.float32))
    assert out is not None and (out == 0).all()

    two = np.zeros((16, 16), np.float32)
    two[3, 3] = 5.0
    two[10, 12] = 9.0
    out = delaunay_interpolate_native(two)
    assert (out == 0).all()         # <3 points -> fill

    collinear = np.zeros((16, 16), np.float32)
    for i in (2, 7, 12):
        collinear[i, i] = float(i)
    out = delaunay_interpolate_native(collinear)
    assert out is not None and np.isfinite(out).all()


def test_interp_dispatch_uses_native(rng):
    depth = np.zeros((40, 50), np.float32)
    idx = rng.choice(40 * 50, 80, replace=False)
    depth.reshape(-1)[idx] = (rng.random(80) * 20 + 1).astype(np.float32)
    a = delaunay_interpolate(depth, use_native=True)
    b = delaunay_interpolate(depth, use_native=False)
    inside = b > 0
    assert np.mean(np.abs(a[inside] - b[inside]) < 1e-3) > 0.95
