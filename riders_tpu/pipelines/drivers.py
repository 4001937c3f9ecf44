"""End-to-end drivers: training loops, stage-2 generation, validation.

These are the public entry points matching the reference's scripts:

* ``train_sml``      <- train_zju.py / train_ntu.py
* ``train_rcnet``    <- RCNet/train_rcnet_zju.py -> rcnet_main.train
* ``run_rcnet``      <- RCNet/run_rcnet_zju.py (quasi-dense depth PNGs)
* ``validate_sml``   <- val_zju.py / val_ntu.py (checkpoint sweep with
                        best-results voting)
* ``evaluate_results_dir`` <- val_with_result.py (offline comparator)

Each stage still interoperates through the reference's on-disk formats
(16-bit PNG trees), so mixed reference/riders_tpu pipelines work; the
fused in-memory path (pipelines/fused.py) is the production alternative.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from riders_tpu.core import checkpoint as ckpt_lib
from riders_tpu.core import logging as log_lib
from riders_tpu.core import metrics as metrics_lib
from riders_tpu.core.config import RidersConfig
from riders_tpu.io import depthio
from riders_tpu.io.input_pipeline import (
    BatchLoader,
    RCNetInferenceDataset,
    RCNetTrainDataset,
    SMLFrameDataset,
)
from riders_tpu.io.manifest import build_manifest
from riders_tpu.models.rcnet import RCNet
from riders_tpu.models.factory import build_sml_model
from riders_tpu.pipelines import rcnet_training, sml_training
from riders_tpu.pipelines.rcnet_inference import make_rcnet_infer_fn
from riders_tpu.pipelines.sml_inference import make_infer_fn


def _dtype(cfg: RidersConfig):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


def _rcnet_dir(rcnet_interp: Optional[str]) -> Optional[str]:
    """Quasi-dense PNG directory for 'rcnet_*' modes; the 'none'/'interp'
    modes read no stage-2 outputs (val_zju.py:81-84: rcnet paths are only
    assembled when 'rcnet' in interp)."""
    return (rcnet_interp
            if rcnet_interp and "rcnet" in rcnet_interp else None)


def _maybe_shard_training(cfg: RidersConfig, step_fn, batch_size: int):
    """Data-parallel training over the configured mesh when more than one
    device is visible (the DataParallel replacement, SURVEY.md 5.8):
    returns (wrapped step_fn, batch sharding or None).  Single-device
    setups get the step back unchanged."""
    import dataclasses as _dc

    from riders_tpu.parallel import sharding as sh

    n_dev = len(jax.devices())
    n_data = cfg.mesh.data_parallel
    if n_data == -1:
        # auto: largest device count the batch splits evenly over
        n_data = n_dev // max(cfg.mesh.points_parallel, 1)
        while n_data > 1 and batch_size % n_data != 0:
            n_data -= 1
    elif batch_size % n_data != 0:
        raise ValueError(
            f"batch size {batch_size} not divisible by the configured "
            f"mesh data_parallel={n_data}")
    if n_dev < 2 or n_data < 2:
        return step_fn, None
    mesh = sh.mesh_from_config(
        _dc.replace(cfg.mesh, data_parallel=n_data))
    return sh.with_data_sharding(mesh, step_fn), sh.batch_sharding(mesh)


def train_sml(cfg: RidersConfig, checkpoint_dir: str,
              resume: bool = False, log_path: Optional[str] = None,
              max_steps: Optional[int] = None) -> None:
    """Stage-3 training loop (train_zju.py:23-422)."""
    t = cfg.sml_train
    records = build_manifest(cfg.dataset, cfg.dataset.train_scenes,
                             rcnet_interp=_rcnet_dir(t.rcnet_interp))
    dataset = SMLFrameDataset(cfg, records, train=True)
    loader = BatchLoader(dataset, t.batch_size, shuffle=True)
    if len(loader) == 0:
        raise ValueError(
            f"{len(dataset)} samples < batch size {t.batch_size}: no full "
            "batch to train on (reduce sml_train.batch_size)")
    steps_per_epoch = max(len(loader), 1)
    n_epochs = t.learning_schedule[-1]
    total_steps = steps_per_epoch * n_epochs

    model = build_sml_model(cfg)
    state, tx = sml_training.init_train_state(
        cfg, model, jax.random.PRNGKey(0), steps_per_epoch)
    if resume and ckpt_lib.latest_step(checkpoint_dir) is not None:
        state = ckpt_lib.restore_train_state(checkpoint_dir, state)
        log_lib.log(f"Resumed from step {int(state.step)}", log_path)
    step_fn = sml_training.make_train_step(cfg, model, tx)
    step_fn, batch_sharding = _maybe_shard_training(cfg, step_fn,
                                                    t.batch_size)
    loader.sharding = batch_sharding

    writer = log_lib.ScalarWriter(checkpoint_dir, "train")
    timer = log_lib.StepTimer(total_steps)
    # hyperparameter dump (the reference's log_params(locals()),
    # train_zju.py:84)
    import dataclasses as _dc
    log_lib.log_params(log_path, _dc.asdict(cfg))
    log_lib.log(f"Training SML: {len(dataset)} samples, "
                f"{steps_per_epoch} steps/epoch, {n_epochs} epochs",
                log_path)

    step = int(state.step)
    for epoch in range(step // steps_per_epoch + 1, n_epochs + 1):
        for batch in loader.epoch():
            state, info = step_fn(state, batch)
            step = int(state.step)
            timer.tick()
            if step % t.n_step_per_summary == 0:
                writer.write(step, info)
            if step % t.n_step_per_checkpoint == 0:
                log_lib.log(
                    f"{timer.format()} Loss={float(info['loss']):.5f}",
                    log_path)
                ckpt_lib.save_train_state(checkpoint_dir, state)
            if max_steps is not None and step >= max_steps:
                ckpt_lib.save_train_state(checkpoint_dir, state)
                writer.close()
                return
    ckpt_lib.save_train_state(checkpoint_dir, state)
    writer.close()


def train_rcnet(cfg: RidersConfig, checkpoint_dir: str,
                resume: bool = False, log_path: Optional[str] = None,
                max_steps: Optional[int] = None) -> None:
    """Stage-2 training loop (rcnet_main.py:20-432)."""
    t = cfg.rcnet_train
    records = build_manifest(cfg.dataset, cfg.dataset.train_scenes)
    dataset = RCNetTrainDataset(cfg, records)
    loader = BatchLoader(dataset, t.batch_size, shuffle=True)
    if len(loader) == 0:
        raise ValueError(
            f"{len(dataset)} samples < batch size {t.batch_size}: no full "
            "batch to train on (reduce rcnet_train.batch_size)")
    steps_per_epoch = max(len(loader), 1)
    n_epochs = t.learning_schedule[-1]
    total_steps = steps_per_epoch * n_epochs

    model = RCNet(config=cfg.rcnet)
    state, tx = rcnet_training.init_rcnet_train_state(
        cfg, model, jax.random.PRNGKey(0), steps_per_epoch)
    if resume and ckpt_lib.latest_step(checkpoint_dir) is not None:
        state = ckpt_lib.restore_train_state(checkpoint_dir, state)
        log_lib.log(f"Resumed from step {int(state.step)}", log_path)
    step_fn = rcnet_training.make_rcnet_train_step(cfg, model, tx)
    step_fn, batch_sharding = _maybe_shard_training(cfg, step_fn,
                                                    t.batch_size)
    loader.sharding = batch_sharding
    summary_fn = rcnet_training.make_rcnet_summary_fn(cfg, model)

    writer = log_lib.ScalarWriter(checkpoint_dir, "train")
    timer = log_lib.StepTimer(total_steps)
    import dataclasses as _dc
    log_lib.log_params(log_path, _dc.asdict(cfg))
    log_lib.log(f"Training RC-Net: {len(dataset)} samples, "
                f"{steps_per_epoch} steps/epoch, {n_epochs} epochs",
                log_path)

    step = int(state.step)
    for epoch in range(step // steps_per_epoch + 1, n_epochs + 1):
        for batch in loader.epoch():
            state, info = step_fn(state, batch)
            step = int(state.step)
            timer.tick()
            if step % t.n_step_per_summary == 0:
                writer.write(step, info)
            if step % t.n_step_per_checkpoint == 0:
                log_lib.log(
                    f"{timer.format()} Loss={float(info['loss']):.5f} "
                    f"P={float(info['precision']):.3f} "
                    f"R={float(info['recall']):.3f}",
                    log_path)
                ckpt_lib.save_train_state(checkpoint_dir, state)
                # Visual summary grid, one row per displayed point:
                # patch | response | output label | GT label | label
                # error | validity | GT depth (the reference's TB panel
                # set, rcnet_model.py:267-476), plus the reference's
                # distribution histograms and label-count scalars.
                panels = jax.device_get(summary_fn(state, batch))
                grid = [[panels["image_patch"][i], panels["response"][i],
                         panels["output_label"][i], panels["label"][i],
                         panels["label_error"][i], panels["validity"][i],
                         panels["gt_depth"][i]]
                        for i in range(panels["response"].shape[0])]
                log_lib.save_image_mosaic(
                    os.path.join(checkpoint_dir, "summaries",
                                 f"step{step}.png"), grid, max_depth=1.0)
                writer.write_histograms(step, {
                    "response": panels["response"],
                    "output_label": panels["output_label"],
                    "label": panels["label"],
                    "gt_depth": panels["gt_depth"]})
                # One combined scalar record, like the reference's
                # loss_info bundle (rcnet_main.py:390-395).
                writer.write(step, {
                    **info,
                    "n_ground_truth_label_per_point":
                        panels["n_ground_truth_label_per_point"],
                    "n_predicted_label_per_point":
                        panels["n_predicted_label_per_point"]})
            if max_steps is not None and step >= max_steps:
                ckpt_lib.save_train_state(checkpoint_dir, state)
                writer.close()
                return
    ckpt_lib.save_train_state(checkpoint_dir, state)
    writer.close()


def run_rcnet(cfg: RidersConfig, checkpoint_dir: str, output_root: str,
              scenes=None, save_color: bool = True,
              log_path: Optional[str] = None) -> None:
    """Stage-2 inference: write quasi-dense depth PNGs in the reference's
    output tree (run_rcnet_zju.py:148-280):
        <output_root>/rcnet_<thr>/<scene>/depth_predicted/<frame>.png
    """
    scenes = scenes or (cfg.dataset.train_scenes + cfg.dataset.val_scenes)
    records = build_manifest(cfg.dataset, scenes, require_all=False)
    dataset = RCNetInferenceDataset(cfg, records)

    model = RCNet(config=cfg.rcnet, dtype=_dtype(cfg))
    state, _ = rcnet_training.init_rcnet_train_state(
        cfg, model, jax.random.PRNGKey(0), steps_per_epoch=1)
    state = ckpt_lib.restore_train_state(checkpoint_dir, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    infer = make_rcnet_infer_fn(cfg, model)

    thr_tag = f"rcnet_{cfg.rcnet.response_threshold}"
    loader = BatchLoader(dataset, batch_size=1, shuffle=False,
                         drop_last=False)
    for idx, batch in enumerate(loader.epoch()):
        out = infer(variables, batch)
        depth = np.asarray(out["depth"][0])
        rec = records[idx]
        out_dir = os.path.join(output_root, thr_tag, rec.scene,
                               "depth_predicted")
        depthio.ensure_dir(out_dir)
        depthio.save_depth(depth, os.path.join(out_dir,
                                               rec.frame_id + ".png"))
        if save_color:
            cdir = depthio.ensure_dir(os.path.join(
                output_root, thr_tag, rec.scene, "depth_predicted_colors"))
            depthio.save_color_depth(
                depth, os.path.join(cdir, rec.frame_id + ".png"))
        if idx % 50 == 0:
            log_lib.log(f"rcnet {idx + 1}/{len(dataset)}", log_path)


def validate_rcnet(cfg: RidersConfig, checkpoint_dir: str,
                   log_path: Optional[str] = None) -> Dict[str, float]:
    """Stage-2 validation (rcnet_main.validate:490-691): score the
    quasi-dense output against the interpolated lidar GT on the
    intersection of their validity maps (MAE/RMSE/iMAE/iRMSE,
    rcnet_main.py:599-606), sweeping all checkpoints with a best-results
    vote."""
    records = build_manifest(cfg.dataset, cfg.dataset.val_scenes,
                             require_all=False)
    dataset = RCNetInferenceDataset(cfg, records)
    gt_maps = [depthio.load_depth(r.gt_interp) for r in records]

    model = RCNet(config=cfg.rcnet, dtype=_dtype(cfg))
    state, _ = rcnet_training.init_rcnet_train_state(
        cfg, model, jax.random.PRNGKey(0), steps_per_epoch=1)
    infer = make_rcnet_infer_fn(cfg, model)

    import orbax.checkpoint as ocp
    mgr = ocp.CheckpointManager(os.path.abspath(checkpoint_dir))
    steps = sorted(mgr.all_steps(), reverse=True)
    mgr.close()

    best = {"step": -1, "mae": np.inf, "rmse": np.inf,
            "imae": np.inf, "irmse": np.inf}
    for step in steps:
        state = ckpt_lib.restore_train_state(checkpoint_dir, state, step)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        loader = BatchLoader(dataset, batch_size=1, shuffle=False,
                             drop_last=False)
        acc = {k: [] for k in ("mae", "rmse", "imae", "irmse")}
        for idx, batch in enumerate(loader.epoch()):
            pred = np.asarray(infer(variables, batch)["depth"][0])
            gt = gt_maps[idx]
            mask = (pred > 0) & (gt > 0)
            if mask.sum() == 0:
                continue
            p, g = pred[mask], gt[mask]
            acc["mae"].append(np.mean(np.abs(1000 * p - 1000 * g)))
            acc["rmse"].append(
                np.sqrt(np.mean((1000 * p - 1000 * g) ** 2)))
            acc["imae"].append(np.mean(np.abs(1 / (0.001 * g)
                                              - 1 / (0.001 * p))))
            acc["irmse"].append(np.sqrt(np.mean(
                (1 / (0.001 * g) - 1 / (0.001 * p)) ** 2)))
        results = {k: float(np.mean(v)) for k, v in acc.items() if v}
        log_lib.log(f"RC-Net validation step {step}: " + "  ".join(
            f"{k}={v:.4f}" for k, v in results.items()), log_path)
        n_improve = sum(results[k] < best[k] for k in results)
        if n_improve >= 3:
            best.update(results)
            best["step"] = step
    log_lib.log(f"RC-Net best: {best}", log_path)
    return best


def _aggregate(per_frame: Dict[str, np.ndarray]) -> Dict[str, float]:
    return {k: float(np.mean(v)) for k, v in per_frame.items()
            if k != "n_valid"}


def validate_sml(cfg: RidersConfig, checkpoint_dir: str,
                 output_path: Optional[str] = None,
                 save_output: bool = False,
                 log_path: Optional[str] = None,
                 batch_size: int = 8) -> Dict[str, float]:
    """Stage-3 validation sweep (val_zju.py:24-394): evaluate every saved
    checkpoint on the clear-day split, vote best results (>3 of 7 improve).
    Returns the best metric bundle."""
    t = cfg.sml_train
    val_interp = t.rcnet_interp_val or t.rcnet_interp
    records = build_manifest(cfg.dataset, cfg.dataset.val_scenes,
                             rcnet_interp=_rcnet_dir(val_interp))
    dataset = SMLFrameDataset(cfg, records, train=False)
    loader = BatchLoader(dataset, batch_size, shuffle=False,
                         drop_last=False)

    model = build_sml_model(cfg, dtype=_dtype(cfg))
    state, _ = sml_training.init_train_state(
        cfg, model, jax.random.PRNGKey(0), steps_per_epoch=1)
    infer = make_infer_fn(cfg, model, with_metrics=True)

    best = {"step": -1, "mae": np.inf, "rmse": np.inf, "imae": np.inf,
            "irmse": np.inf, "abs_rel": np.inf, "sq_rel": np.inf,
            "delta1": 0.0}

    import orbax.checkpoint as ocp  # enumerate all steps
    mgr = ocp.CheckpointManager(os.path.abspath(checkpoint_dir))
    steps = sorted(mgr.all_steps(), reverse=True)
    mgr.close()

    for step in steps:
        state = ckpt_lib.restore_train_state(checkpoint_dir, state, step)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        per_frame: Dict[str, list] = {}
        frame_idx = 0
        for batch in loader.epoch():
            out = infer(variables, batch)
            m = jax.device_get(out["metrics"])
            n = batch["image"].shape[0]
            for k, v in m.items():
                per_frame.setdefault(k, []).append(np.asarray(v))
            if save_output and output_path:
                depths = np.asarray(out["depth"])
                for i in range(n):
                    rec = records[frame_idx + i]
                    ddir = depthio.ensure_dir(os.path.join(
                        output_path, "SML", rec.scene, "sml_depth"))
                    depthio.save_depth(
                        depths[i], os.path.join(ddir,
                                                rec.frame_id + ".png"))
                if frame_idx == 0:
                    # one inspection mosaic per checkpoint: image | aligned
                    # prior | prediction (the reference's TB image grids,
                    # log_utils.log_summary:102-287)
                    log_lib.save_image_mosaic(
                        os.path.join(output_path, "SML",
                                     f"mosaic-step{step}.png"),
                        [np.asarray(batch["image"][0]),
                         1.0 / np.maximum(np.asarray(out["int_depth"][0]),
                                          1e-3),
                         depths[0]],
                        max_depth=cfg.eval.max_depth_val)
            frame_idx += n
        results = _aggregate(
            {k: np.concatenate(v) for k, v in per_frame.items()})
        log_lib.log_evaluation_results("Validation results", results,
                                       step, log_path)
        if metrics_lib.improves_best(results, best):
            best.update(results)
            best["step"] = step
        log_lib.log_evaluation_results(
            "Best results", {k: best[k] for k in results}, best["step"],
            log_path)
    return best


def evaluate_results_dir(cfg: RidersConfig, result_root: str,
                         depth_subdir: str = "sml_depth",
                         log_path: Optional[str] = None) -> Dict[str, float]:
    """Offline comparator (val_with_result.py:8-77): score any directory of
    predicted depth PNGs against the sparse lidar GT."""
    records = build_manifest(cfg.dataset, cfg.dataset.val_scenes,
                             require_all=False)
    per_frame: Dict[str, list] = {}
    n_scored = 0
    for rec in records:
        pred_path = os.path.join(result_root, rec.scene, depth_subdir,
                                 rec.frame_id + ".png")
        if not os.path.exists(pred_path) or rec.gt_sparse is None:
            continue
        pred = depthio.load_depth(pred_path)
        gt = depthio.load_depth(rec.gt_sparse)
        m = metrics_lib.compute_depth_metrics(
            jnp.asarray(pred), jnp.asarray(gt),
            cfg.eval.min_depth_val, cfg.eval.max_depth_val,
            cfg.eval.delta_threshold)
        for k, v in jax.device_get(m).items():
            per_frame.setdefault(k, []).append(float(v))
        n_scored += 1
    results = _aggregate({k: np.asarray(v) for k, v in per_frame.items()})
    log_lib.log(f"Scored {n_scored} frames", log_path)
    log_lib.log_evaluation_results("Results", results, -1, log_path)
    return results
