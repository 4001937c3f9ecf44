"""Fused stage-1 + stage-3 inference: the production depth path.

The reference's val loop (val_zju.py:124-245, call stack SURVEY.md 3.1)
crosses host<->device >=4 times per frame and calls two scipy CPU solvers.
Here the entire chain

    validity/inversion -> bounded scale alignment -> clamp ->
    scale-map synthesis -> resize to net shape -> intermediate norm ->
    SML forward -> invert -> bicubic upsample -> (optional) metrics

is ONE jitted XLA program, vmapped over the frame batch and shardable over
a device mesh on the `data` axis.  No host roundtrips, no dynamic shapes.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from riders_tpu.core import metrics as metrics_lib
from riders_tpu.core.config import RidersConfig
from riders_tpu.models.sml import ScaleMapLearner
from riders_tpu.ops import alignment, scale_map
from riders_tpu.ops import interp as interp_ops
from riders_tpu.ops.resize import resize2d


def prepare_sml_inputs(cfg: RidersConfig,
                       image: jnp.ndarray,
                       mono_pred: jnp.ndarray,
                       radar: jnp.ndarray,
                       rcnet: Optional[jnp.ndarray] = None
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stage-1 for one frame: returns (x, d) network inputs.

    Args (all (H, W) except image (H, W, 3) in [0, 1]):
      mono_pred: relative (inverse) monocular depth prior.
      radar: sparse radar depth in metres (0 = no return).
      rcnet: quasi-dense stage-2 depth in metres, or None for the
        non-RCNet paths selected by ``cfg.sml_train.rcnet_interp``:
        'none' scatters raw radar knots only (val_zju.py:176-179),
        'interp' densifies the knot scales over the frame - the
        Interpolator2D path (modules/interpolator.py:20-50) as a
        device IDW approximation (ops/interp.idw_scale_map).
    Returns:
      x: (net_h, net_w, 3) normalized (int_depth, int_scales, gray).
      d: (net_h, net_w, 1) unnormalized aligned inverse depth.
    """
    a = cfg.alignment
    net_shape = cfg.sml.net_shape

    radar_inv, radar_valid = alignment.validity_and_inverse(
        radar, a.min_depth, a.max_depth)
    int_depth = alignment.align_mono_prior(
        mono_pred, radar_inv, radar_valid,
        mode=a.mode, mono_type=a.mono_type,
        bounds_inv=a.bounds_inv, bounds_pos=a.bounds_pos,
        iterations=a.iterations, min_pred=a.min_pred, max_pred=a.max_pred,
        max_valid=a.max_valid_pixels)

    if rcnet is not None:
        rcnet_inv, rcnet_valid = alignment.validity_and_inverse(
            rcnet, a.min_depth, a.max_depth)
        scales = scale_map.synthesize_scale_map(
            int_depth, radar_inv, radar_valid, rcnet_inv, rcnet_valid)
    elif cfg.sml_train.rcnet_interp in ("interp", "interp-exact"):
        if cfg.sml_train.rcnet_interp == "interp-exact":
            # Host-exact griddata via pure_callback (correctness mode).
            dense = interp_ops.exact_scale_map(int_depth, radar_inv,
                                               radar_valid)
        else:
            dense = interp_ops.idw_scale_map(int_depth, radar_inv,
                                             radar_valid)
        # Raw radar knots overwrite their own pixels exactly, as the rcnet
        # path does (val_zju.py:173-175); then unit-range normalize.
        scales = jnp.where(radar_valid.astype(bool),
                           radar_inv / int_depth, dense)
        scales = scale_map.normalize_unit_range(scales)
    else:
        scales = scale_map.synthesize_scale_map(
            int_depth, radar_inv, radar_valid)

    # All SML inputs are nearest-resized (transforms.py:127-169 with
    # INTER_NEAREST) to the static network shape.  Grayscale commutes
    # exactly with nearest resampling (selection is per-pixel), so the
    # luma reduction runs BEFORE the resize: the resize matmuls then move
    # one channel instead of three (~0.4 ms/call on the ZJU bench).
    d_net = resize2d(int_depth[..., None], net_shape, "nearest")
    s_net = resize2d(scales[..., None], net_shape, "nearest")
    gray = resize2d(scale_map.grayscale(image)[..., None], net_shape,
                    "nearest")[..., 0]

    dn, sn = scale_map.normalize_intermediate(
        d_net[..., 0], s_net[..., 0],
        cfg.sml.int_depth_mean, cfg.sml.int_depth_std,
        cfg.sml.int_scales_mean, cfg.sml.int_scales_std)
    x = jnp.stack([dn, sn, gray], axis=-1)
    return x, d_net


def make_infer_fn(cfg: RidersConfig, model: ScaleMapLearner,
                  with_metrics: bool = True):
    """Build the jitted batch inference function.

    Returns fn(variables, batch) -> dict with 'depth' (B, H, W) metric depth
    at frame resolution and per-frame metrics when `with_metrics` and the
    batch carries 'gt_sparse'.
    """
    frame_shape = cfg.dataset.image_shape

    def one_frame_inputs(image, mono_pred, radar, rcnet):
        return prepare_sml_inputs(cfg, image, mono_pred, radar, rcnet)

    use_rcnet = "rcnet" in (cfg.sml_train.rcnet_interp or "")

    @jax.jit
    def infer(variables, batch: Dict[str, jnp.ndarray]):
        image = batch["image"]
        rcnet = batch.get("rcnet") if use_rcnet else None
        if rcnet is None:
            x, d = jax.vmap(
                lambda i, m, r: prepare_sml_inputs(cfg, i, m, r, None))(
                    image, batch["mono_pred"], batch["radar"])
        else:
            x, d = jax.vmap(one_frame_inputs)(
                image, batch["mono_pred"], batch["radar"], rcnet)

        pred_inv, scales = model.apply(variables, x, d)

        # 1/pred upsampled bicubically to frame resolution
        # (val_zju.py:200-210, align_corners=False).
        depth = resize2d(1.0 / pred_inv, frame_shape, "bicubic",
                         align_corners=False)[..., 0]

        out = {"depth": depth, "int_depth": d[..., 0], "scales": scales}
        if with_metrics and "gt_sparse" in batch:
            out["metrics"] = jax.vmap(
                lambda p, g: metrics_lib.compute_depth_metrics(
                    p, g, cfg.eval.min_depth_val, cfg.eval.max_depth_val,
                    cfg.eval.delta_threshold))(depth, batch["gt_sparse"])
        return out

    return infer
