"""Depth evaluation metrics.

Mirrors the seven metrics of the reference (utils/eval_utils.py:17-117) and
the evaluation protocol of val_zju.py:212-231: metrics are computed over the
sparse-lidar validity mask intersected with a (min_depth, max_depth) window,
with MAE/RMSE/AbsRel/SqRel computed in millimetres (x1000) and iMAE/iRMSE on
kilometre-inverse scale (x0.001).

Two implementations:

* ``masked_*``: pure-JAX, mask-weighted, jit/vmap-friendly (static shapes).
  The reference boolean-indexes (`pred[mask]`) which is a dynamic shape; the
  mask-weighted reduction is algebraically identical for mean-based metrics.
* ``compute_depth_metrics``: the full 7-metric bundle for one frame.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(x * mask) / denom


def masked_mae(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute error over mask (eval_utils.py:31-43)."""
    return _masked_mean(jnp.abs(target - pred), mask)


def masked_rmse(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Root mean squared error over mask (eval_utils.py:17-29)."""
    return jnp.sqrt(_masked_mean((target - pred) ** 2, mask))


def masked_imae(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Inverse-depth MAE (eval_utils.py:59-71).  Inputs are depths; the
    reciprocal is guarded by the mask (masked entries contribute zero)."""
    safe_pred = jnp.where(mask > 0, pred, 1.0)
    safe_tgt = jnp.where(mask > 0, target, 1.0)
    return _masked_mean(jnp.abs(1.0 / safe_tgt - 1.0 / safe_pred), mask)


def masked_irmse(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Inverse-depth RMSE (eval_utils.py:45-57)."""
    safe_pred = jnp.where(mask > 0, pred, 1.0)
    safe_tgt = jnp.where(mask > 0, target, 1.0)
    return jnp.sqrt(_masked_mean((1.0 / safe_tgt - 1.0 / safe_pred) ** 2, mask))


def masked_abs_rel(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute relative error (eval_utils.py:73-85)."""
    safe_tgt = jnp.where(mask > 0, target, 1.0)
    return _masked_mean(jnp.abs(pred - target) / safe_tgt, mask)


def masked_sq_rel(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean squared relative error (eval_utils.py:88-100)."""
    safe_tgt = jnp.where(mask > 0, target, 1.0)
    return _masked_mean((pred - target) ** 2 / safe_tgt, mask)


def masked_delta(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray,
                 thr: float = 1.25) -> jnp.ndarray:
    """Threshold accuracy delta < thr (eval_utils.py:103-117)."""
    safe_pred = jnp.where(mask > 0, pred, 1.0)
    safe_tgt = jnp.where(mask > 0, target, 1.0)
    ratio = jnp.maximum(safe_tgt / safe_pred, safe_pred / safe_tgt)
    return _masked_mean((ratio < thr).astype(jnp.float32), mask)


def compute_depth_metrics(pred: jnp.ndarray,
                          gt_sparse: jnp.ndarray,
                          min_depth: float,
                          max_depth: float,
                          delta_threshold: float = 1.25) -> Dict[str, jnp.ndarray]:
    """Full per-frame metric bundle under the reference protocol.

    `pred` and `gt_sparse` are (H, W) depths in metres.  The mask is
    gt_sparse > 0 intersected with min/max depth window (val_zju.py:213-220);
    mm scaling of MAE/RMSE/AbsRel/SqRel and km^-1 scaling of iMAE/iRMSE
    follows val_zju.py:225-231.
    """
    mask = ((gt_sparse > 0)
            & (gt_sparse > min_depth)
            & (gt_sparse < max_depth)).astype(jnp.float32)
    p, t = pred, gt_sparse
    return {
        "mae": masked_mae(1000.0 * p, 1000.0 * t, mask),
        "rmse": masked_rmse(1000.0 * p, 1000.0 * t, mask),
        "imae": masked_imae(0.001 * p, 0.001 * t, mask),
        "irmse": masked_irmse(0.001 * p, 0.001 * t, mask),
        "abs_rel": masked_abs_rel(1000.0 * p, 1000.0 * t, mask),
        "sq_rel": masked_sq_rel(1000.0 * p, 1000.0 * t, mask),
        "delta1": masked_delta(p, t, mask, delta_threshold),
        "n_valid": jnp.sum(mask),
    }


def improves_best(results: Dict[str, float], best: Dict[str, float]) -> bool:
    """Best-results vote: >3 of 7 metrics improve (val_zju.py:269-285)."""
    n = 0
    for k in ("mae", "rmse", "imae", "irmse", "abs_rel", "sq_rel"):
        if round(float(results[k]), 4) < round(float(best[k]), 4):
            n += 1
    if round(float(results["delta1"]), 4) > round(float(best["delta1"]), 4):
        n += 1
    return n > 3
