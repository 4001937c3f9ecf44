"""Stage-2 inference: quasi-dense radar depth generation.

Replaces the host-orchestrated per-frame loop of RCNet/run_rcnet_zju.py:204-
264 + rcnet_main.forward_output:435-487 with one jitted program per frame:
point shifting, box construction, full-image encode, per-point patch
decode, thresholded composition and the adaptive threshold-decay retry all
run on device over a fixed-size point bucket.

Image edge-padding stays on the host input pipeline (a cheap numpy pad),
keeping the device path shape-static.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from riders_tpu.core.config import RidersConfig
from riders_tpu.models.rcnet import RCNet
from riders_tpu.ops.patches import adaptive_compose


def pad_image_for_patches(image: np.ndarray,
                          patch_size: Tuple[int, int]) -> np.ndarray:
    """Edge-pad an (H, W, C) image by patch//2 per side
    (rcnet_main.py:441-444, datasets.py:177-182)."""
    pad_y, pad_x = patch_size[0] // 2, patch_size[1] // 2
    return np.pad(image, ((pad_y, pad_y), (pad_x, pad_x), (0, 0)),
                  mode="edge")


def shift_points_and_boxes(points: jnp.ndarray,
                           patch_size: Tuple[int, int]
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shift (u, v, z) points into padded-image coordinates and build the
    patch boxes centred on them (run_rcnet_zju.py:223-232)."""
    pad_y, pad_x = patch_size[0] // 2, patch_size[1] // 2
    shifted = points + jnp.asarray([pad_x, pad_y, 0.0], points.dtype)
    boxes = jnp.stack([
        shifted[..., 0] - pad_x, shifted[..., 1] - pad_y,
        shifted[..., 0] + pad_x, shifted[..., 1] + pad_y], axis=-1)
    return shifted, boxes


def make_rcnet_infer_fn(cfg: RidersConfig, model: RCNet):
    """Build the jitted stage-2 function.

    fn(variables, batch) with batch:
      image: (B, Hp, Wp, 3) EDGE-PADDED frames, [0, 1] normalized.
      points: (B, K, 3) radar (u, v, z) in UNPADDED pixel coordinates.
      point_mask: (B, K).
    Returns dict with 'depth'/'response' (B, H, W) quasi-dense maps and the
    final per-frame thresholds.
    """
    patch = cfg.rcnet.patch_size
    H, W = cfg.dataset.image_shape

    @jax.jit
    def infer(variables, batch: Dict[str, jnp.ndarray]):
        points, boxes = shift_points_and_boxes(batch["points"], patch)
        responses = model.apply(
            variables, batch["image"], points, boxes, batch["point_mask"],
            train=False, return_logits=False)
        # (B, K, ph, pw, 1) -> (B, K, ph, pw)
        responses = responses[..., 0].astype(jnp.float32)

        def one(resp, pts, mask):
            return adaptive_compose(
                resp, pts, mask, (H, W), patch,
                cfg.rcnet.response_threshold,
                cfg.rcnet.threshold_decay,
                cfg.rcnet.max_threshold_retries)

        depth, response, thr = jax.vmap(one)(
            responses, points, batch["point_mask"])
        return {"depth": depth, "response": response, "threshold": thr}

    return infer
