"""Sparse-depth hygiene ops: outlier removal and dilation.

TPU-native equivalents of utils/net_utils.py:575-638 (OutlierRemoval: local
min-pool consistency filter) and the MaxPool2d ground-truth dilation of
train_zju.py:158-165, built on lax.reduce_window so XLA fuses them into the
surrounding pipeline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def remove_outliers(depth: jnp.ndarray,
                    kernel_size: int = 7,
                    threshold: float = 1.5) -> jnp.ndarray:
    """Remove depth measurements that exceed their local minimum by more than
    `threshold` metres (net_utils.py:591-638).

    Zeros (holes) are filled with 10*max before the min-filter so they never
    win; measurements with min_neighbourhood < depth - threshold are dropped.
    Operates on the last two axes of an (..., H, W) array.
    """
    max_value = 10.0 * jnp.max(depth)
    filled = jnp.where(depth > 0.0, depth, max_value)

    pad = kernel_size // 2
    window = (1,) * (depth.ndim - 2) + (kernel_size, kernel_size)
    strides = (1,) * depth.ndim
    # Constant-pad with max_value (reference pads before min-pool,
    # net_utils.py:616-627).
    min_values = -jax.lax.reduce_window(
        -filled, -max_value, jax.lax.max, window, strides,
        padding=[(0, 0)] * (depth.ndim - 2) + [(pad, pad), (pad, pad)])

    keep = min_values >= depth - threshold
    return jnp.where(keep, depth, 0.0)


def dilate_max(depth: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Max-pool dilation with stride 1, 'same' padding (train_zju.py:158-165)."""
    if kernel_size <= 1:
        return depth
    pad = kernel_size // 2
    window = (1,) * (depth.ndim - 2) + (kernel_size, kernel_size)
    strides = (1,) * depth.ndim
    return jax.lax.reduce_window(
        depth, -jnp.inf, jax.lax.max, window, strides,
        padding=[(0, 0)] * (depth.ndim - 2) + [(pad, pad), (pad, pad)])
