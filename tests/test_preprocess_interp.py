"""Tests for projection math, .pcd reading, interpolation and RANSAC."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from riders_tpu.io.preprocess import projection
from riders_tpu.ops.alignment import scale_shift_ransac
from riders_tpu.ops.interp import (
    delaunay_interpolate,
    idw_interpolate,
    interpolate_scale_knots,
)


def test_homogeneous_transform_matches_reference(rng):
    pts = rng.random((10, 4)).astype(np.float32)
    pts[:, 3] = 1.0
    T = np.eye(4)
    T[:3, 3] = [1.0, 2.0, 3.0]
    out = projection.homogeneous_transformation(pts, T)
    # reference computes transform.dot(points.T).T (project_transform.py:15)
    ref = T.dot(pts.T).T
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_project_pcl_roundtrip():
    """Points at known 3D positions project to the expected pixels and come
    back depth-sorted descending."""
    P = np.array([[100.0, 0, 64, 0],
                  [0, 100.0, 48, 0],
                  [0, 0, 1, 0],
                  [0, 0, 0, 1]])
    cloud = np.array([[0.1, 0.1, 10.0],
                      [-0.05, 0.0, 5.0],
                      [0.0, 0.0, -2.0]], np.float32)  # behind camera
    uvs, depth = projection.project_pcl_to_image(
        cloud, np.eye(4), P, (96, 128))
    assert len(depth) == 2
    assert depth[0] >= depth[1]          # descending
    # u = 100*x/z + 64
    assert uvs[0, 0] == round(100 * 0.1 / 10 + 64)
    d_map = projection.scatter_to_depth_map(uvs, depth, (96, 128))
    assert (d_map > 0).sum() == 2


def test_read_pcd_ascii_and_binary(tmp_path):
    pts = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]], np.float32)
    ascii_path = tmp_path / "a.pcd"
    with open(ascii_path, "w") as f:
        f.write("# .PCD v0.7\nVERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\n"
                "TYPE F F F\nCOUNT 1 1 1\nWIDTH 2\nHEIGHT 1\n"
                "POINTS 2\nDATA ascii\n")
        for p in pts:
            f.write(" ".join(str(v) for v in p) + "\n")
    out = projection.read_pcd(str(ascii_path))
    np.testing.assert_allclose(out, pts)

    bin_path = tmp_path / "b.pcd"
    with open(bin_path, "wb") as f:
        f.write(b"VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n"
                b"COUNT 1 1 1\nWIDTH 2\nHEIGHT 1\nPOINTS 2\nDATA binary\n")
        f.write(pts.tobytes())
    out = projection.read_pcd(str(bin_path))
    np.testing.assert_allclose(out, pts)


def test_delaunay_interpolate_matches_scipy(rng):
    """Cross-check against a direct scipy call (the reference's
    data_utils.interpolate_depth semantics)."""
    from scipy.interpolate import LinearNDInterpolator
    depth = np.zeros((40, 50), np.float32)
    idx = rng.integers(0, depth.size, 60)
    depth.reshape(-1)[idx] = rng.random(60).astype(np.float32) * 40 + 1

    ours = delaunay_interpolate(depth, use_native=False)
    r, c = np.where(depth > 0)
    interp = LinearNDInterpolator(np.stack([r, c], 1), depth[r, c],
                                  fill_value=0)
    qr, qc = np.meshgrid(np.arange(40), np.arange(50), indexing="ij")
    ref = interp(np.stack([qr.ravel(), qc.ravel()], 1)).reshape(40, 50)
    np.testing.assert_allclose(ours, ref, atol=1e-5)

    # interpolate_depth_delft (data_utils.py:333-367) = interpolate_depth
    # with a default validity map; same function here, same result.
    np.testing.assert_allclose(
        delaunay_interpolate(depth, validity_map=depth > 0.0,
                             use_native=False), ours, atol=0)


def test_interpolate_scale_knots_constant():
    int_depth = np.full((20, 24), 0.1, np.float32)
    sparse = np.zeros((20, 24), np.float32)
    valid = np.zeros((20, 24), np.float32)
    for (r, c) in [(2, 3), (15, 20), (18, 2), (5, 12)]:
        sparse[r, c] = 0.2
        valid[r, c] = 1.0
    out = interpolate_scale_knots(int_depth, sparse, valid)
    # inside the hull the ratio is exactly 2; outside it's filled with 1
    assert abs(out[10, 10] - 2.0) < 1e-5
    assert abs(out[0, 23] - 1.0) < 1e-5


def test_idw_interpolate_hits_knots():
    pts = jnp.asarray([[5.0, 7.0], [20.0, 15.0]])
    vals = jnp.asarray([2.0, 8.0])
    mask = jnp.ones(2)
    out = np.asarray(idw_interpolate(pts, vals, mask, (24, 32)))
    assert abs(out[7, 5] - 2.0) < 0.05
    assert abs(out[15, 20] - 8.0) < 0.05
    # no valid points -> zeros
    out0 = np.asarray(idw_interpolate(pts, vals, jnp.zeros(2), (24, 32)))
    assert (out0 == 0).all()


def test_idw_scale_map_approximates_host_griddata():
    from riders_tpu.ops.interp import idw_scale_map
    rng = np.random.default_rng(3)
    int_depth = np.full((20, 24), 0.1, np.float32)
    sparse = np.zeros((20, 24), np.float32)
    valid = np.zeros((20, 24), np.float32)
    for (r, c) in [(2, 3), (15, 20), (18, 2), (5, 12), (9, 9)]:
        sparse[r, c] = 0.1 * (1.5 + rng.random())
        valid[r, c] = 1.0
    exact = interpolate_scale_knots(int_depth, sparse, valid)
    approx = np.asarray(idw_scale_map(jnp.asarray(int_depth),
                                      jnp.asarray(sparse),
                                      jnp.asarray(valid), max_knots=8))
    # the IDW map reproduces every knot exactly and tracks the host
    # griddata interpolant loosely in between (documented approximation)
    for (r, c) in [(2, 3), (15, 20), (18, 2), (5, 12), (9, 9)]:
        assert abs(approx[r, c] - sparse[r, c] / 0.1) < 0.02
    hull = exact != 1.0
    assert np.mean(np.abs(approx[hull] - exact[hull])) < 0.25

    # no knots at all -> ones (griddata fill_value=1.0 semantics)
    ones = np.asarray(idw_scale_map(jnp.asarray(int_depth),
                                    jnp.zeros((20, 24), jnp.float32),
                                    jnp.zeros((20, 24), jnp.float32)))
    assert (ones == 1.0).all()


def test_ransac_recovers_scale_shift(rng):
    pred = rng.random((40, 50)).astype(np.float32)
    target = 2.0 * pred + 0.5
    # corrupt 20% of valid pixels
    mask = (rng.random((40, 50)) > 0.5).astype(np.float32)
    outliers = (rng.random((40, 50)) < 0.2) & (mask > 0)
    target = np.where(outliers, target + 5.0, target).astype(np.float32)

    scale, shift = scale_shift_ransac(
        jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask),
        jax.random.PRNGKey(0), num_iterations=60, sample_size=5,
        inlier_threshold=0.02)
    assert abs(float(scale) - 2.0) < 0.05
    assert abs(float(shift) - 0.5) < 0.05
