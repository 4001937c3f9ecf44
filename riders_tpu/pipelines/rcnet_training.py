"""Stage-2 (RC-Net) training: on-device label synthesis + weighted BCE.

Replaces RCNet/rcnet_main.train:257-432.  The host input pipeline supplies
padded frames, the fixed-K point bucket, patch boxes and per-patch GT depth
crops; correspondence labels (|gt - radar_z| < max_distance ^ gt > 0) and
the validity map are synthesized on device (rcnet_main.py:304-332), and the
positive-class-weighted masked BCE (rcnet_model.py:125-166) additionally
masks padded bucket slots.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from riders_tpu.core.config import RidersConfig
from riders_tpu.models.rcnet import RCNet
from riders_tpu.ops.losses import weighted_bce_with_logits
from riders_tpu.pipelines.sml_training import TrainState


def synthesize_labels(gt_crops: jnp.ndarray,
                      radar_z: jnp.ndarray,
                      max_distance: float,
                      set_invalid_to_negative: bool = False
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Correspondence labels and validity (rcnet_main.py:304-332).

    gt_crops: (B, K, ph, pw, 1) GT depth crops; radar_z: (B, K).
    A pixel is a positive iff |gt - z| < max_distance and gt > 0; pixels
    without GT are invalid (excluded from loss) unless
    `set_invalid_to_negative`.
    """
    z = radar_z[:, :, None, None, None]
    dist = jnp.abs(gt_crops - z)
    labels = ((dist < max_distance) & (gt_crops > 0)).astype(jnp.float32)
    if set_invalid_to_negative:
        validity = jnp.ones_like(gt_crops)
    else:
        validity = (gt_crops > 0).astype(jnp.float32)
    return labels, validity


def make_rcnet_lr_schedule(cfg: RidersConfig, steps_per_epoch: int):
    rates = list(cfg.rcnet_train.learning_rates)
    bounds = list(cfg.rcnet_train.learning_schedule)
    boundaries = {int(b * steps_per_epoch): rates[min(i + 1, len(rates) - 1)]
                  / max(rates[i], 1e-30)
                  for i, b in enumerate(bounds[:-1])}
    return optax.piecewise_constant_schedule(rates[0], boundaries)


def init_rcnet_train_state(cfg: RidersConfig, model: RCNet,
                           rng: jax.Array, steps_per_epoch: int
                           ) -> Tuple[TrainState, optax.GradientTransformation]:
    H, W = cfg.dataset.image_shape
    ph, pw = cfg.rcnet.patch_size
    K = 2
    image = jnp.zeros((1, H + ph, W + pw, 3))
    pts = jnp.zeros((1, K, 3))
    boxes = jnp.tile(jnp.asarray([0.0, 0.0, float(pw), float(ph)]),
                     (1, K, 1))
    variables = model.init(rng, image, pts, boxes, train=True)
    tx = optax.adam(make_rcnet_lr_schedule(cfg, steps_per_epoch))
    params = variables["params"]
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=variables.get("batch_stats", {}),
                      opt_state=tx.init(params)), tx


def make_rcnet_train_step(cfg: RidersConfig, model: RCNet,
                          tx: optax.GradientTransformation):
    """batch: image (B,Hp,Wp,3) padded+normalized, points (B,K,3) in padded
    coords, boxes (B,K,4), gt_crops (B,K,ph,pw,1), point_mask (B,K)."""
    t = cfg.rcnet_train

    def loss_fn(params, batch_stats, batch):
        variables = {"params": params, "batch_stats": batch_stats}
        logits, updates = model.apply(
            variables, batch["image"], batch["points"], batch["boxes"],
            batch["point_mask"], train=True, return_logits=True,
            mutable=["batch_stats"])

        labels, validity = synthesize_labels(
            batch["gt_crops"], batch["points"][..., 2],
            t.max_distance_correspondence, t.set_invalid_to_negative_class)
        validity = validity * batch["point_mask"][:, :, None, None, None]

        loss = weighted_bce_with_logits(
            logits, labels, validity, t.w_positive_class)
        # Correspondence-classifier quality scalars (the reference logs
        # these visually via TB mosaics, rcnet_model.py:267-476; here they
        # are in-graph and nearly free since logits are already resident).
        pred_pos = (logits > 0).astype(jnp.float32) * validity
        true_pos = jnp.sum(pred_pos * labels)
        aux = {
            "loss": loss,
            "n_positive": jnp.sum(labels * validity),
            "n_valid": jnp.sum(validity),
            "precision": true_pos / jnp.maximum(jnp.sum(pred_pos), 1.0),
            "recall": true_pos / jnp.maximum(jnp.sum(labels * validity),
                                             1.0),
        }
        return loss, (aux, updates.get("batch_stats", batch_stats))

    @jax.jit
    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        (loss, (aux, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=new_params,
                          batch_stats=new_stats, opt_state=new_opt), aux

    return train_step


def make_rcnet_summary_fn(cfg: RidersConfig, model: RCNet,
                          n_display: int = 4):
    """Visual training summaries - the reference's per-n_step_per_summary
    TB image grids (rcnet_model.log_summary:267-476 via
    rcnet_main.py:363-409) in the repo's idiom: a jitted forward on the
    current batch returning, for the first `n_display` valid points, the
    full reference panel set - input image patch, sigmoid response,
    thresholded output label (response > 0.5, rcnet_main.py:385-388),
    synthesized GT label, relative label error on valid pixels
    (rcnet_model.py:371-377), the validity map and the GT depth crop -
    plus the reference's per-point label-count scalars
    (rcnet_main.py:390-395).  Arrays are (n, ph, pw[, 3]), ready for a
    `core.logging.save_image_mosaic` grid (one row per point).

    Run only on summary steps; one extra inference-mode forward."""
    t = cfg.rcnet_train
    ph, pw = cfg.rcnet.patch_size
    lo, hi = cfg.rcnet.normalized_image_range

    @jax.jit
    def summarize(state: TrainState, batch: Dict[str, jnp.ndarray]):
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        response = model.apply(
            variables, batch["image"], batch["points"], batch["boxes"],
            batch["point_mask"], train=False, return_logits=False)[..., 0]
        labels, validity = synthesize_labels(
            batch["gt_crops"], batch["points"][..., 2],
            t.max_distance_correspondence, t.set_invalid_to_negative_class)

        B, K = batch["points"].shape[:2]
        n = min(n_display, B * K)
        mask = batch["point_mask"].reshape(-1)
        # First n valid bucket slots in batch order (the reference logs
        # the first n_display samples; its loader has no padded slots).
        order_bias = jnp.arange(mask.size, 0, -1, dtype=jnp.float32)
        _, idx = jax.lax.top_k(mask * mask.size + order_bias, n)
        bi, ki = idx // K, idx % K

        def pick_patch(b, k):
            x1 = batch["boxes"][b, k, 0].astype(jnp.int32)
            y1 = batch["boxes"][b, k, 1].astype(jnp.int32)
            return jax.lax.dynamic_slice(
                jnp.take(batch["image"], b, axis=0), (y1, x1, 0),
                (ph, pw, 3))

        flat = lambda a: a.reshape((B * K,) + a.shape[2:])[idx]
        resp = flat(response)
        lab = flat(labels[..., 0])
        val = flat(validity[..., 0])
        gtd = flat(batch["gt_crops"][..., 0])
        out_label = (resp > 0.5).astype(jnp.float32)
        # Relative label error on valid pixels (rcnet_model.py:371-377).
        err = jnp.where(val == 1.0,
                        (jnp.abs(out_label - lab) + 1e-8) / (lab + 1e-8),
                        val)
        return {
            "image_patch": (jax.vmap(pick_patch)(bi, ki) - lo) / (hi - lo),
            "response": resp,
            "output_label": out_label,
            "label": lab,
            "label_error": err,
            "validity": val,
            # GT depth colorized against 100 m like the reference
            # (rcnet_model.py:432-443 output_depth / 100).
            "gt_depth": gtd / 100.0,
            "n_ground_truth_label_per_point": jnp.mean(
                jnp.sum(labels[..., 0], axis=(-2, -1))),
            "n_predicted_label_per_point": jnp.mean(jnp.sum(
                (response > 0.5).astype(jnp.float32), axis=(-2, -1))),
        }

    return summarize
