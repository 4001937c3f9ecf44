"""Fully-fused three-stage inference: radar points -> metric depth.

One jitted XLA program per batch:

  edge-pad frame -> RC-Net (full-image encode, K-patch decode) ->
  thresholded confidence composition (quasi-dense radar depth) ->
  bounded scale alignment of the mono prior -> scale-map synthesis ->
  SML forward -> bicubic upsample -> dense metric depth

This is the production serving path and the benchmark target
(BASELINE.json: >=500 fps/chip fused RC-Net+SML at 640x512).  The
reference runs these as two separate processes communicating through PNG
files (run_rcnet_zju.py then val_zju.py, SURVEY.md 1 "file-bus"); fusing
removes the filesystem, the host loops and every intermediate
quantization.

The fused path applies the reference's adaptive threshold decay
(run_rcnet_zju.py:254-264) in closed form - the per-frame effective
threshold is computed from the masked response maximum
(ops/patches.adaptive_threshold_value), so one composition reproduces the
retry loop exactly with no loop cost.  `rcnet.adaptive_composition=False`
restores the fixed threshold.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from riders_tpu.core.config import RidersConfig
from riders_tpu.models.rcnet import RCNet
from riders_tpu.models.sml import ScaleMapLearner
from riders_tpu.models import sml_folded
from riders_tpu.ops.patches import (adaptive_threshold_value,
                                    compose_patches_batched)
from riders_tpu.ops.resize import edge_pad2d, resize2d
from riders_tpu.pipelines.rcnet_inference import shift_points_and_boxes
from riders_tpu.pipelines.sml_inference import prepare_sml_inputs


def make_fused_fn(cfg: RidersConfig, rcnet: RCNet, sml: ScaleMapLearner):
    """Build fn(rc_vars, sml_vars, batch) -> (B, H, W) metric depth.

    batch:
      image: (B, H, W, 3) frames in [0, 1], or uint8 (compact host
        staging: 4x fewer H2D bytes, normalized on device).
      mono_pred: (B, H, W) relative inverse-depth prior, or uint16 PNG16
        fixed-point codes (io/depthio.py x256 codec, decoded on device).
      radar_points: (B, K, 3) (u, v, z) in unpadded pixel coords.
      point_mask: (B, K).
    """
    patch = cfg.rcnet.patch_size
    H, W = cfg.dataset.image_shape
    pad_y, pad_x = patch[0] // 2, patch[1] // 2
    # The W-folded SML stage (exact re-layout, parity-tested:
    # tests/test_sml_folded.py) measured SLOWER than the literal module
    # in a same-session ZJU A/B (401.5 vs 442.3 fps - see the
    # sml_folded.py docstring and PERF.md); it stays available as an
    # opt-in experiment via RIDERS_SML_FOLD=1.
    use_fold = (sml.dtype == jnp.bfloat16
                and cfg.sml.model_type == "midas-small"
                and sml_folded.supports_folding(sml, cfg.sml.net_shape))

    @jax.jit
    def fused(rc_vars, sml_vars, batch: Dict[str, jnp.ndarray]):
        image = batch["image"]
        if image.dtype == jnp.uint8:
            image = image.astype(jnp.float32) * (1.0 / 255.0)
        mono = batch["mono_pred"]
        if mono.dtype == jnp.uint16:
            mono = mono.astype(jnp.float32) * (1.0 / 256.0)
        # Edge-pad on device (rcnet_main.py:441-444) via one-hot matmuls
        # - jnp.pad(mode='edge') lowers through boundary-row relayouts
        # that cost ~2.4 ms/call (ops/resize.edge_pad2d).  Padding in the
        # RC-Net compute dtype is exact (one-hot selection) and only the
        # RC-Net branch consumes the padded frame.
        padded = edge_pad2d(image.astype(rcnet.dtype), pad_y, pad_x)

        points, boxes = shift_points_and_boxes(batch["radar_points"], patch)
        responses = rcnet.apply(
            rc_vars, padded, points, boxes,
            batch["point_mask"], train=False,
            return_logits=False)[..., 0].astype(jnp.float32)

        if cfg.rcnet.adaptive_composition:
            # Reference adaptive retry (run_rcnet_zju.py:254-264) in
            # closed form: per-frame effective thresholds, one compose.
            thr = adaptive_threshold_value(
                responses, batch["point_mask"],
                cfg.rcnet.response_threshold, cfg.rcnet.threshold_decay,
                cfg.rcnet.max_threshold_retries)
        else:
            thr = cfg.rcnet.response_threshold
        quasi_depth, _ = compose_patches_batched(
            responses, points, batch["point_mask"], (H, W), patch, thr)

        # Scatter the raw radar returns onto the frame grid for the
        # alignment target (the quasi-dense map already contains them, but
        # alignment uses only the raw sparse returns - val_zju.py:145-169).
        radar_sparse = jax.vmap(
            lambda pts, m: _scatter_points(pts, m, (H, W)))(
                batch["radar_points"], batch["point_mask"])

        x, d = jax.vmap(
            lambda img, mono_p, radar, q: prepare_sml_inputs(
                cfg, img, mono_p, radar, q))(
                    image, mono, radar_sparse, quasi_depth)

        if use_fold:
            # W-folded SML forward (models/sml_folded.py): exact
            # re-layout of the same ops on a full-lane (B,H,W/4,4C)
            # canvas; the literal module path burns ~7.65 ms/call in
            # quarter-lane convs + layout copies (PERF.md round-4).
            pred_inv, _ = sml_folded.folded_sml_apply(
                sml, sml_vars, x.astype(sml.dtype), d)
        else:
            pred_inv, _ = sml.apply(sml_vars, x.astype(sml.dtype), d)
        depth = resize2d(1.0 / pred_inv, (H, W), "bicubic",
                         align_corners=False)[..., 0]
        return depth

    return fused


def make_sharded_fused_fn(cfg: RidersConfig, rcnet: RCNet,
                          sml: ScaleMapLearner, mesh=None):
    """Fused inference sharded over the configured device mesh
    (core.config.MeshConfig): frames over `data`, the radar-point patch
    axis over `points` - the B x K patch decode is RC-Net's dominant work
    (SURVEY.md 2.10b), so a 640x512 stream scales across chips without
    growing the frame batch.

    Returns fn(rc_vars, sml_vars, batch) like `make_fused_fn`; inputs are
    device_put with their shardings, variables replicated, and jit/GSPMD
    partitions the whole program (the (B, K) -> B*K flatten keeps both
    axis shardings)."""
    from riders_tpu.parallel import sharding as sh

    if mesh is None:
        mesh = sh.mesh_from_config(cfg.mesh)
    fused = make_fused_fn(cfg, rcnet, sml)
    rep = sh.replicated(mesh)

    def sharded(rc_vars, sml_vars, batch):
        rc_vars = jax.device_put(rc_vars, rep)
        sml_vars = jax.device_put(sml_vars, rep)
        batch = sh.shard_batch(mesh, batch,
                               point_keys=("radar_points", "point_mask"))
        with mesh:
            return fused(rc_vars, sml_vars, batch)

    return sharded


def _scatter_points(points: jnp.ndarray, mask: jnp.ndarray,
                    shape) -> jnp.ndarray:
    """Scatter (u, v, z) points to a sparse (H, W) depth map."""
    H, W = shape
    u = jnp.clip(points[:, 0].astype(jnp.int32), 0, W - 1)
    v = jnp.clip(points[:, 1].astype(jnp.int32), 0, H - 1)
    z = points[:, 2] * mask
    return jnp.zeros((H, W), jnp.float32).at[v, u].set(z)
