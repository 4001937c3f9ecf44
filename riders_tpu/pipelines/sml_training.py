"""Stage-3 (SML) training: vmapped stage-1, fused loss, data-parallel step.

Replaces the reference's train loop (train_zju.py:228-422) whose inner
per-sample host loop (:270-343) does alignment and scale-map synthesis in
numpy per image.  Here the whole step - alignment, synthesis, forward, loss,
backward, Adam update - is one jitted program; the batch axis shards over
the mesh `data` axis and XLA inserts the gradient all-reduce.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from riders_tpu.core.config import RidersConfig
from riders_tpu.models.sml import ScaleMapLearner
from riders_tpu.ops import losses as losses_lib
from riders_tpu.ops import outlier
from riders_tpu.pipelines.sml_inference import prepare_sml_inputs
from riders_tpu.ops.resize import resize2d


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def make_lr_schedule(cfg: RidersConfig, steps_per_epoch: int):
    """Piecewise-constant epoch schedule (train_zju.py:228-237): learning
    rate i applies until epoch learning_schedule[i]."""
    rates = list(cfg.sml_train.learning_rates)
    bounds = list(cfg.sml_train.learning_schedule)
    boundaries = {int(b * steps_per_epoch): rates[min(i + 1, len(rates) - 1)] /
                  max(rates[i], 1e-30)
                  for i, b in enumerate(bounds[:-1])}
    return optax.piecewise_constant_schedule(rates[0], boundaries)


def make_optimizer(cfg: RidersConfig, steps_per_epoch: int):
    """Adam with optional decoupled weight decay (train_zju.py:206-211)."""
    schedule = make_lr_schedule(cfg, steps_per_epoch)
    wd = cfg.sml_train.w_weight_decay
    if wd > 0:
        return optax.adamw(schedule, weight_decay=wd)
    return optax.adam(schedule)


def init_train_state(cfg: RidersConfig, model: ScaleMapLearner,
                     rng: jax.Array, steps_per_epoch: int) -> Tuple[
                         TrainState, optax.GradientTransformation]:
    h, w = cfg.sml.net_shape
    x = jnp.zeros((1, h, w, cfg.sml.in_channels))
    d = jnp.ones((1, h, w, 1))
    variables = model.init(rng, x, d, train=True)
    tx = make_optimizer(cfg, steps_per_epoch)
    params = variables["params"]
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params))
    return state, tx


def make_train_step(cfg: RidersConfig, model: ScaleMapLearner,
                    tx: optax.GradientTransformation):
    """Build the jitted training step.

    batch: dict of (B, H, W[, C]) arrays - image, mono_pred, radar,
    gt_interp, gt_sparse, rcnet (optional).  Augmentations (flip, crop,
    radar noise, photometric) happen in the host input pipeline.
    """
    t = cfg.sml_train
    net_shape = cfg.sml.net_shape

    use_rcnet = "rcnet" in (t.rcnet_interp or "")

    def loss_fn(params, batch_stats, batch):
        # Stage-1 on device, vmapped: replaces train_zju.py:270-343.
        rcnet = batch.get("rcnet") if use_rcnet else None
        if rcnet is not None:
            x, d = jax.vmap(
                lambda i, m, r, q: prepare_sml_inputs(cfg, i, m, r, q))(
                    batch["image"], batch["mono_pred"], batch["radar"], rcnet)
        else:
            x, d = jax.vmap(
                lambda i, m, r: prepare_sml_inputs(cfg, i, m, r, None))(
                    batch["image"], batch["mono_pred"], batch["radar"])

        variables = {"params": params, "batch_stats": batch_stats}
        (pred_inv, _), updates = model.apply(
            variables, x, d, train=True, mutable=["batch_stats"])

        # Invert to metric depth (train_zju.py:355-356).
        depth_pred = 1.0 / pred_inv
        d_depth = 1.0 / d

        # Ground truth is nearest-resized to the network grid (the
        # reference's transform resizes gt with the sample,
        # transforms.py:133-139).
        gt_interp = resize2d(batch["gt_interp"][..., None], net_shape,
                             "nearest")
        gt_sparse = resize2d(batch["gt_sparse"][..., None], net_shape,
                             "nearest")

        invalid_map_gt = gt_interp <= 0
        if t.gt_dilation_kernel_size > 1:
            gt_interp = outlier.dilate_max(
                gt_interp.transpose(0, 3, 1, 2),
                t.gt_dilation_kernel_size).transpose(0, 2, 3, 1)
        if (t.gt_outlier_removal_kernel_size > 1
                and t.gt_outlier_removal_threshold > 0):
            gt_interp = outlier.remove_outliers(
                gt_interp.transpose(0, 3, 1, 2),
                t.gt_outlier_removal_kernel_size,
                t.gt_outlier_removal_threshold).transpose(0, 2, 3, 1)

        loss, info = losses_lib.sml_loss(
            image=d_depth,
            output_depth=depth_pred,
            gt_interp=gt_interp,
            gt_sparse=gt_sparse,
            loss_func=t.loss_func,
            w_smoothness=t.w_smoothness,
            sobel_filter_size=t.sobel_filter_size,
            validity_map_loss_smoothness=jnp.ones_like(d_depth),
            w_lidar_loss=t.w_lidar_loss,
            w_edge=t.w_edge,
            invalid_map_gt=invalid_map_gt,
            w_unsupervised=t.w_unsupervised)
        return loss, (info, updates.get("batch_stats", batch_stats))

    @jax.jit
    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (info, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, batch)
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state)
        return new_state, {"loss": loss, **info}

    return train_step
