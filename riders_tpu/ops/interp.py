"""Sparse-depth interpolation: host Delaunay and device approximation.

The reference interpolates sparse depth/scale maps three ways, all through
scipy's Qhull-backed LinearNDInterpolator:

* ``interpolate_depth`` (+UTV/delft variants) for the offline lidar GT
  densification (data/data_utils.py:231-367);
* ``Interpolator2D`` for the non-RCNet scale-map path at inference
  (modules/interpolator.py:7-50).

Qhull is genuinely host work; ``delaunay_interpolate`` keeps those exact
semantics on CPU for preprocessing.  For the device-resident inference
path, ``idw_interpolate`` provides a jit-friendly approximation (masked
inverse-distance weighting via a softmax over a fixed point bucket) - an
acknowledged approximation, selected by config, never silently substituted.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def delaunay_interpolate(depth_map: np.ndarray,
                         validity_map: Optional[np.ndarray] = None,
                         log_space: bool = False,
                         use_native: bool = True) -> np.ndarray:
    """Barycentric (Delaunay) interpolation of a sparse map
    (data_utils.py:231-274 semantics; host CPU).

    This single function covers both of the reference's full-frame
    variants: ``interpolate_depth`` (data_utils.py:231-274) and
    ``interpolate_depth_delft`` (:333-367) are semantically identical
    there (same interpolator, fill values and log-space handling; the
    delft copy only adds the validity-map-from-depth default, which this
    function also implements).

    When `use_native` and the C++ library is available (native/delaunay.cpp,
    ~27x scipy), it handles the non-log path; otherwise scipy/Qhull.  The
    two differ only in triangulation choice at exactly-cocircular grid
    points (both are valid Delaunay interpolants)."""
    if use_native and not log_space:
        from riders_tpu.io.native import delaunay_interpolate_native
        if validity_map is None:
            validity_map = depth_map > 0.0
        if validity_map.sum() >= 3:
            out = delaunay_interpolate_native(depth_map, validity_map)
            if out is not None:
                return out

    from scipy.interpolate import LinearNDInterpolator

    assert depth_map.ndim == 2
    if validity_map is None:
        validity_map = depth_map > 0.0
    rows, cols = depth_map.shape
    ridx, cidx = np.where(validity_map)
    if len(ridx) < 3:
        return np.zeros_like(depth_map)
    values = depth_map[ridx, cidx]
    if log_space:
        values = np.log(values)
    interp = LinearNDInterpolator(
        points=np.stack([ridx, cidx], axis=1), values=values,
        fill_value=0 if not log_space else np.log(1e-3))
    qr, qc = np.meshgrid(np.arange(rows), np.arange(cols), indexing="ij")
    out = interp(np.stack([qr.ravel(), qc.ravel()], axis=1)).reshape(
        rows, cols)
    if log_space:
        out = np.exp(out)
        out[out < 1e-1] = 0.0
    return out.astype(np.float32)


def delaunay_interpolate_windowed(depth_map: np.ndarray,
                                  validity_map: Optional[np.ndarray] = None,
                                  log_space: bool = False,
                                  window_size: int = 12) -> np.ndarray:
    """UTV variant (data_utils.py:277-329): only pixels with a valid
    measurement inside a window_size neighbourhood are interpolated."""
    assert depth_map.ndim == 2
    if validity_map is None:
        validity_map = depth_map > 0.0
    dense = delaunay_interpolate(depth_map, validity_map, log_space)

    # validity window via a max filter
    from scipy.ndimage import maximum_filter
    has_neighbor = maximum_filter(
        (depth_map > 0).astype(np.float32), size=window_size,
        mode="nearest") > 0
    out = np.where(has_neighbor, dense, 0.0)
    return out.astype(np.float32)


def interpolate_scale_knots(int_depth: np.ndarray,
                            sparse_inv: np.ndarray,
                            valid: np.ndarray) -> np.ndarray:
    """Interpolator2D equivalent (modules/interpolator.py:20-50): dense
    scale map from per-knot observed/prior ratios via griddata, ones
    outside the convex hull."""
    from scipy.interpolate import griddata

    ridx, cidx = np.where(valid > 0)
    if len(ridx) < 3:
        return np.ones_like(int_depth, np.float32)
    knots = sparse_inv[ridx, cidx] / int_depth[ridx, cidx]
    grid_r, grid_c = np.mgrid[0:int_depth.shape[0], 0:int_depth.shape[1]]
    out = griddata(np.stack([ridx, cidx], axis=1), knots,
                   (grid_r, grid_c), method="linear", fill_value=1.0)
    return out.astype(np.float32)


def idw_scale_map(int_depth_inv: jnp.ndarray,
                  sparse_inv: jnp.ndarray,
                  valid: jnp.ndarray,
                  max_knots: int = 128) -> jnp.ndarray:
    """Device-side Interpolator2D equivalent (modules/interpolator.py:20-50)
    for the ``interp`` scale-map mode: densify the per-knot observed/prior
    ratios ``sparse_inv/int_depth_inv`` over the full frame.

    The reference's class uses scipy griddata (host Qhull); this is the
    jit-friendly IDW approximation over a fixed knot bucket, selected by
    ``sml_train.rcnet_interp == 'interp'`` - never silently substituted.
    ``interpolate_scale_knots`` below is the host-exact twin the tests use
    to bound the approximation.

    All map inputs are (H, W); returns the (H, W) dense scale map with
    ones where no knots exist (griddata fill_value=1.0 semantics).
    """
    H, W = int_depth_inv.shape
    flat_valid = valid.reshape(-1).astype(jnp.float32)
    _, idx = jax.lax.top_k(flat_valid, max_knots)
    knot_mask = flat_valid[idx]
    vv = (idx // W).astype(jnp.float32)
    uu = (idx % W).astype(jnp.float32)
    ratios = (sparse_inv.reshape(-1)[idx]
              / jnp.maximum(int_depth_inv.reshape(-1)[idx], 1e-8))
    dense = idw_interpolate(jnp.stack([uu, vv], axis=-1), ratios,
                            knot_mask, (H, W))
    return jnp.where(jnp.sum(knot_mask) > 0, dense,
                     jnp.ones_like(int_depth_inv))


def exact_scale_map(int_depth_inv: jnp.ndarray,
                    sparse_inv: jnp.ndarray,
                    valid: jnp.ndarray) -> jnp.ndarray:
    """Host-exact Interpolator2D (scipy griddata) inside a jitted program
    via pure_callback - the `interp-exact` scale-map mode.

    Bit-matches the reference's modules/interpolator.py:20-50 semantics
    (Qhull Delaunay, linear barycentric, ones outside the hull) at the
    cost of a host round-trip per frame; `idw_scale_map` is the
    device-resident approximation (PARITY.md records the metric deltas
    between the two on the synthetic val protocol)."""

    def host(d, s, v):
        return interpolate_scale_knots(
            np.asarray(d), np.asarray(s), np.asarray(v))

    return jax.pure_callback(
        host, jax.ShapeDtypeStruct(int_depth_inv.shape, jnp.float32),
        int_depth_inv, sparse_inv, valid, vmap_method="sequential")


def idw_interpolate(points_uv: jnp.ndarray,
                    points_val: jnp.ndarray,
                    point_mask: jnp.ndarray,
                    shape: Tuple[int, int],
                    power: float = 2.0,
                    eps: float = 1e-6) -> jnp.ndarray:
    """Device-side inverse-distance-weighted densification over a fixed
    point bucket - the jit-friendly approximation of the Delaunay path.

    points_uv: (K, 2) (u, v); points_val: (K,); point_mask: (K,).
    Returns (H, W) dense map (zeros if no valid points).
    """
    H, W = shape
    vv = jnp.arange(H, dtype=jnp.float32)[:, None]
    uu = jnp.arange(W, dtype=jnp.float32)[None, :]
    du = uu[None] - points_uv[:, 0][:, None, None]
    dv = vv[None] - points_uv[:, 1][:, None, None]
    d2 = du * du + dv * dv + eps
    w = point_mask[:, None, None] / (d2 ** (power / 2.0))
    denom = jnp.sum(w, axis=0)
    num = jnp.sum(w * points_val[:, None, None], axis=0)
    any_valid = jnp.sum(point_mask) > 0
    return jnp.where(any_valid, num / jnp.maximum(denom, eps), 0.0)
