"""Loss library: masked regression, Sobel smoothness/edge, weighted BCE.

TPU-native re-design of utils/loss.py and RCNet/rcnet_model.py:125-166.
The reference boolean-indexes targets (`output[mask]`), which is a dynamic
shape; every loss here is a mask-weighted reduction with identical value.
Sobel filtering is expressed as grouped convolutions XLA fuses on the MXU.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def l1_loss(pred, target, mask):
    return masked_mean(jnp.abs(pred - target), mask)


def l2_loss(pred, target, mask):
    return masked_mean((pred - target) ** 2, mask)


def smooth_l1_loss(pred, target, mask, beta: float = 1.0):
    """Huber / smooth-L1 with torch's default beta=1 (loss.py:139-152)."""
    diff = jnp.abs(pred - target)
    val = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    return masked_mean(val, mask)


_LOSS_FNS = {"l1": l1_loss, "l2": l2_loss, "smoothl1": smooth_l1_loss}


def masked_median(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median of x over mask, matching torch.median (lower middle element).

    Masked-out entries are pushed to +inf before sorting; the element at
    index (count-1)//2 of the valid prefix is selected.
    """
    flat = x.reshape(-1)
    m = mask.reshape(-1) > 0
    n = jnp.sum(m.astype(jnp.int32))
    s = jnp.sort(jnp.where(m, flat, jnp.inf))
    idx = jnp.maximum((n - 1) // 2, 0)
    return s[idx]


def sobel_filters(size: int) -> Tuple[np.ndarray, np.ndarray]:
    """Handcrafted size x size Sobel-style gradient filters
    (utils/loss.py:260-274)."""
    gx = np.ones((size, size), np.float32)
    gy = np.ones((size, size), np.float32)
    c = size // 2
    gx[:, c] = 0.0
    gx[c, c - 1] = 2.0
    gx[c, c + 1] = 2.0
    gx[:, c:] = -gx[:, c:]
    gy[c, :] = 0.0
    gy[c - 1, c] = 2.0
    gy[c + 1, c] = 2.0
    gy[c + 1:, :] = -gy[c + 1:, :]
    return gx, gy


def _replicate_pad(x: jnp.ndarray, pad_h: int, pad_w: int) -> jnp.ndarray:
    """Edge-replicate pad the H, W axes of an (N, H, W, 1) array."""
    return jnp.pad(x, ((0, 0), (pad_h, pad_h), (pad_w, pad_w), (0, 0)),
                   mode="edge")


def _conv_valid(x: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """VALID conv of (N, H, W, 1) with a single 2-D kernel."""
    k = jnp.asarray(kernel, x.dtype)[:, :, None, None]  # HWIO
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def sobel_smoothness_loss(predict: jnp.ndarray,
                          image: jnp.ndarray,
                          weights: jnp.ndarray,
                          filter_size: int = 7
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Edge-aware smoothness + edge-matching losses (utils/loss.py:187-252).

    Args:
      predict: (N, H, W, 1) predicted depth.
      image:   (N, H, W, C) guidance image (C=1 gray or C=3 RGB).
      weights: (N, H, W, 1) per-pixel weights.
    Returns:
      (smoothness_loss, edge_matching_loss) scalars.
    """
    if image.shape[-1] == 3:
        r, g, b = jnp.split(image, 3, axis=-1)
        image = 0.299 * r + 0.587 * g + 0.114 * b

    pad = filter_size // 2
    gx, gy = sobel_filters(filter_size)
    gxs, gys = sobel_filters(3)

    image_pad = _replicate_pad(image, pad, pad)
    image_smooth = _replicate_pad(image, 1, 1)
    predict_pad = _replicate_pad(predict, pad, pad)

    image_dy = _conv_valid(image_pad, gy)
    image_dx = _conv_valid(image_pad, gx)
    image_smooth_dy = _conv_valid(image_smooth, gys)
    image_smooth_dx = _conv_valid(image_smooth, gxs)
    predict_dy = _conv_valid(predict_pad, gy)
    predict_dx = _conv_valid(predict_pad, gx)

    # Edge-aware weights from the small-filter gradients (loss.py:235-236).
    weights_x = jnp.exp(-jnp.abs(image_smooth_dy))
    weights_y = jnp.exp(-jnp.abs(image_smooth_dx))

    smoothness_x = jnp.mean(weights * weights_x * jnp.abs(predict_dx))
    smoothness_y = jnp.mean(weights * weights_y * jnp.abs(predict_dy))
    smoothness = (smoothness_x + smoothness_y) / float(filter_size * filter_size)

    loss_dx = jnp.mean(weights * jnp.abs(jnp.abs(predict_dx) - jnp.abs(image_dx)))
    loss_dy = jnp.mean(weights * jnp.abs(jnp.abs(predict_dy) - jnp.abs(image_dy)))
    edge_matching = (loss_dx + loss_dy) / float(filter_size * filter_size)

    return smoothness, edge_matching


def sml_loss(image: jnp.ndarray,
             output_depth: jnp.ndarray | Sequence[jnp.ndarray],
             gt_interp: jnp.ndarray,
             gt_sparse: jnp.ndarray,
             loss_func: str = "l1",
             w_smoothness: float = 0.2,
             sobel_filter_size: int = 7,
             validity_map_loss_smoothness: jnp.ndarray | None = None,
             w_lidar_loss: float = 1.5,
             w_edge: float = 0.0,
             invalid_map_gt: jnp.ndarray | None = None,
             w_unsupervised: float = 0.0
             ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Stage-3 training loss (utils/loss.py:5-135).

    All maps are (N, H, W, 1).  `image` is the guidance channel the reference
    passes (the aligned input depth, train_zju.py:374-376).
    """
    fn = _LOSS_FNS[loss_func]

    if w_lidar_loss > 0.0:
        # Avoid double counting where sparse lidar exists (loss.py:26-33).
        gt_interp = gt_interp * (gt_sparse <= 0.0).astype(gt_interp.dtype)

    valid_gt = (gt_interp > 0).astype(jnp.float32)
    valid_lidar = (gt_sparse > 0).astype(jnp.float32)

    outputs = output_depth if isinstance(output_depth, (list, tuple)) \
        else [output_depth]
    n_scales = len(outputs)

    if validity_map_loss_smoothness is None:
        validity_map_loss_smoothness = jnp.ones_like(gt_interp)

    loss_supervised = 0.0
    loss_lidar = 0.0
    loss_smoothness = 0.0
    loss_edge = 0.0
    loss_unsupervised = 0.0

    for scale, output in enumerate(outputs):
        w_scale = 1.0 / (2 ** (n_scales - scale - 1))
        loss_supervised += w_scale * fn(output, gt_interp, valid_gt)
        if w_lidar_loss > 0.0:
            loss_lidar += w_scale * fn(output, gt_sparse, valid_lidar)
        if w_unsupervised > 0.0 and invalid_map_gt is not None:
            inv_mask = invalid_map_gt.astype(jnp.float32)
            om = masked_median(output, inv_mask)
            im = masked_median(image, inv_mask)
            loss_unsupervised += w_scale * fn(
                output / om, image / im, inv_mask)
        if w_smoothness > 0.0 or w_edge > 0.0:
            sm, ed = sobel_smoothness_loss(
                output, image, validity_map_loss_smoothness, sobel_filter_size)
            loss_smoothness += w_scale * sm
            loss_edge += w_scale * ed

    loss = (loss_supervised
            + w_lidar_loss * loss_lidar
            + w_smoothness * loss_smoothness
            + w_edge * loss_edge
            + w_unsupervised * loss_unsupervised)

    return loss, {
        "loss": loss,
        "loss_supervised": loss_supervised,
        "loss_lidar": loss_lidar,
        "loss_smoothness": loss_smoothness,
        "loss_edge": loss_edge,
        "loss_unsupervised": loss_unsupervised,
    }


def weighted_bce_with_logits(logits: jnp.ndarray,
                             targets: jnp.ndarray,
                             validity_map: jnp.ndarray,
                             w_positive_class: float = 1.0
                             ) -> jnp.ndarray:
    """Positive-class-weighted BCE over a validity mask
    (RCNet/rcnet_model.py:125-166).

    Numerically stable form:
      l = pw * y * softplus(-x) + (1 - y) * softplus(x)
    """
    x, y = logits, targets
    per_elem = (w_positive_class * y * jax.nn.softplus(-x)
                + (1.0 - y) * jax.nn.softplus(x))
    return jnp.sum(validity_map * per_elem) / jnp.sum(validity_map)
