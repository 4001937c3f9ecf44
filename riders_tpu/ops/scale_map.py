"""Scale-map synthesis for the Scale Map Learner input.

Builds the `int_scales` network input from the aligned mono prior and the
sparse/quasi-dense inverse-depth observations, replacing the per-sample numpy
host loop of the reference (train_zju.py:303-316, val_zju.py:171-179) with a
vmappable device function.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = float(jnp.finfo(jnp.float32).eps)


def normalize_unit_range(data: jnp.ndarray,
                         guard: bool = True) -> jnp.ndarray:
    """(x - min) / (max - min)  (modules/midas/utils.py:223-237).

    The reference raises on a constant array; on device we return the input
    unchanged in that case (guard=True), which only arises for degenerate
    frames with <2 observations - the same frames the reference guards with
    `valid.sum() > 1` (train_zju.py:309-316).
    """
    lo = jnp.min(data)
    hi = jnp.max(data)
    rng = hi - lo
    if guard:
        safe = jnp.where(rng > _EPS, rng, 1.0)
        return jnp.where(rng > _EPS, (data - lo) / safe, data)
    return (data - lo) / rng


def synthesize_scale_map(int_depth: jnp.ndarray,
                         sparse_inv: jnp.ndarray,
                         sparse_valid: jnp.ndarray,
                         rcnet_inv: jnp.ndarray | None = None,
                         rcnet_valid: jnp.ndarray | None = None,
                         normalize: bool = True) -> jnp.ndarray:
    """Per-pixel observed/prior scale ratios (val_zju.py:171-179).

    Ones everywhere; where the quasi-dense rcnet map is valid the ratio
    rcnet/int_depth; where raw radar is valid it overrides with
    radar/int_depth; finally unit-range normalized.

    All inputs are (H, W); `*_valid` are float/bool masks; `int_depth` is the
    aligned inverse depth (strictly positive after clamping).
    """
    scales = jnp.ones_like(int_depth)
    if rcnet_inv is not None:
        rv = rcnet_valid.astype(bool)
        scales = jnp.where(rv, rcnet_inv / int_depth, scales)
    sv = sparse_valid.astype(bool)
    scales = jnp.where(sv, sparse_inv / int_depth, scales)
    if normalize:
        scales = normalize_unit_range(scales)
    return scales


def grayscale(image: jnp.ndarray, channel_axis: int = -1) -> jnp.ndarray:
    """ITU-R 601 luma used throughout the reference
    (val_zju.py:191, utils/loss.py:205-207): 0.299 R + 0.587 G + 0.114 B."""
    r, g, b = jnp.split(image, 3, axis=channel_axis)
    return (0.299 * r + 0.587 * g + 0.114 * b).squeeze(channel_axis)


def normalize_intermediate(int_depth: jnp.ndarray,
                           int_scales: jnp.ndarray,
                           depth_mean: float = 0.729,
                           depth_std: float = 0.210,
                           scales_mean: float = 0.404,
                           scales_std: float = 0.117):
    """Channel standardization of the SML intermediate inputs
    (modules/midas/transforms.py:173-193, 330-335)."""
    d = (int_depth - depth_mean) / depth_std
    s = (int_scales - scales_mean) / scales_std
    return d, s
