"""Tests for core.metrics (vs eval_utils numpy semantics) and io.depthio
(byte-roundtrip of the x256 PNG codec)."""

import numpy as np

import jax.numpy as jnp

from riders_tpu.core import metrics
from riders_tpu.io import depthio


def _np_metrics(pred, gt, min_d, max_d):
    mask = np.logical_and(gt > 0, np.logical_and(gt > min_d, gt < max_d))
    p, t = pred[mask], gt[mask]
    return {
        "mae": np.mean(np.abs(1000 * t - 1000 * p)),
        "rmse": np.sqrt(np.mean((1000 * t - 1000 * p) ** 2)),
        "imae": np.mean(np.abs(1.0 / (0.001 * t) - 1.0 / (0.001 * p))),
        "irmse": np.sqrt(np.mean((1.0 / (0.001 * t) - 1.0 / (0.001 * p)) ** 2)),
        "abs_rel": np.mean(np.abs(1000 * p - 1000 * t) / (1000 * t)),
        "sq_rel": np.mean((1000 * p - 1000 * t) ** 2 / (1000 * t)),
        "delta1": np.mean(np.maximum(t / p, p / t) < 1.25),
    }


def test_metrics_match_numpy(rng):
    gt = np.zeros((60, 80), np.float32)
    idx = rng.integers(0, gt.size, 200)
    gt.reshape(-1)[idx] = rng.random(200).astype(np.float32) * 45 + 1
    pred = np.clip(gt + rng.normal(0, 1.0, gt.shape).astype(np.float32),
                   0.5, None)
    ref = _np_metrics(pred, gt, 0.0, 50.0)
    ours = metrics.compute_depth_metrics(
        jnp.asarray(pred), jnp.asarray(gt), 0.0, 50.0)
    for k, v in ref.items():
        np.testing.assert_allclose(float(ours[k]), v, rtol=2e-4,
                                   err_msg=f"metric {k}")


def test_improves_best_vote():
    best = {k: 1.0 for k in
            ("mae", "rmse", "imae", "irmse", "abs_rel", "sq_rel")}
    best["delta1"] = 0.5
    better = {k: 0.5 for k in best}
    better["delta1"] = 0.9
    assert metrics.improves_best(better, best)
    worse = {k: 2.0 for k in best}
    worse["delta1"] = 0.1
    assert not metrics.improves_best(worse, best)


def test_depth_png_roundtrip(tmp_path, rng):
    z = (rng.random((48, 64)) * 80).astype(np.float32)
    path = str(tmp_path / "depth.png")
    depthio.save_depth(z, path)
    z2 = depthio.load_depth(path)
    # x256 fixed-point: quantization error < 1/256.
    assert np.max(np.abs(z - z2)) < 1.0 / 256.0 + 1e-6


def test_response_png_roundtrip(tmp_path, rng):
    r = rng.random((32, 32)).astype(np.float32)
    path = str(tmp_path / "resp.png")
    depthio.save_response(r, path)
    r2 = depthio.load_response(path)
    assert np.max(np.abs(r - r2)) < 1.0 / 2 ** 14 + 1e-7


def test_radar_points_roundtrip(tmp_path):
    pts = np.array([[5, 7, 12.5], [10, 3, 40.0]], np.float32)
    npy = str(tmp_path / "pts.npy")
    np.save(npy, pts)
    loaded = depthio.load_radar_points(npy)
    np.testing.assert_array_equal(loaded, pts)

    sparse = depthio.scatter_points_to_map(pts, (16, 16))
    assert sparse[7, 5] == 12.5 and sparse[3, 10] == 40.0

    png = str(tmp_path / "pts.png")
    depthio.save_depth(sparse, png)
    from_png = depthio.load_radar_points(png)
    assert from_png.shape == (2, 3)
    np.testing.assert_allclose(sorted(from_png[:, 2]), [12.5, 40.0],
                               atol=1 / 256)


def test_pad_points():
    pts = np.ones((3, 3), np.float32)
    padded, valid = depthio.pad_points(pts, 8)
    assert padded.shape == (8, 3) and valid.sum() == 3
    truncated, valid2 = depthio.pad_points(np.ones((10, 3), np.float32), 8)
    assert valid2.sum() == 8


def test_save_color_depth(tmp_path, rng):
    z = (rng.random((16, 16)) * 10).astype(np.float32)
    depthio.save_color_depth(z, str(tmp_path / "c.png"), max_depth=10.0)
    img = depthio.load_image(str(tmp_path / "c.png"))
    assert img.shape == (16, 16, 3)


def test_path_list_roundtrip(tmp_path):
    """Newline-delimited path lists (data_utils.py:18-56)."""
    from riders_tpu.io.depthio import read_paths, write_paths

    p = str(tmp_path / "paths.txt")
    paths = ["/a/b/0.png", "/a/b/1.png", "rel/2.png"]
    write_paths(p, paths)
    assert read_paths(p) == paths
