"""End-to-end pipeline smoke tests on tiny synthetic scenes (CPU)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from riders_tpu.core.config import zju_config
from riders_tpu.models.rcnet import RCNet
from riders_tpu.models.sml import ScaleMapLearner
from riders_tpu.pipelines.rcnet_inference import (
    make_rcnet_infer_fn,
    pad_image_for_patches,
)
from riders_tpu.pipelines.sml_inference import make_infer_fn
from riders_tpu.pipelines.sml_training import (
    init_train_state,
    make_train_step,
)


def tiny_config():
    cfg = zju_config()
    return cfg.replace(
        dataset=dataclasses.replace(cfg.dataset, image_shape=(96, 128),
                                    max_points=8),
        sml=dataclasses.replace(cfg.sml, net_shape=(64, 96)),
        rcnet=dataclasses.replace(cfg.rcnet, patch_size=(48, 32)),
    )


def synthetic_batch(rng, cfg, batch=2):
    H, W = cfg.dataset.image_shape
    true_depth = (5.0 + 40.0 * rng.random((batch, H, W))).astype(np.float32)
    mono = (1.0 / true_depth) / 0.05
    radar = np.zeros((batch, H, W), np.float32)
    for b in range(batch):
        idx = rng.integers(0, H * W, 30)
        radar[b].reshape(-1)[idx] = true_depth[b].reshape(-1)[idx]
    gt_sparse = np.zeros((batch, H, W), np.float32)
    for b in range(batch):
        idx = rng.integers(0, H * W, 200)
        gt_sparse[b].reshape(-1)[idx] = true_depth[b].reshape(-1)[idx]
    return {
        "image": rng.random((batch, H, W, 3)).astype(np.float32),
        "mono_pred": mono.astype(np.float32),
        "radar": radar,
        "rcnet": radar.copy(),
        "gt_interp": true_depth,
        "gt_sparse": gt_sparse,
    }


def test_sml_inference_pipeline(rng):
    cfg = tiny_config()
    model = ScaleMapLearner(config=cfg.sml)
    h, w = cfg.sml.net_shape
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, h, w, 3)), jnp.ones((1, h, w, 1)))
    infer = make_infer_fn(cfg, model)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_batch(rng, cfg).items()}
    out = infer(variables, batch)
    H, W = cfg.dataset.image_shape
    assert out["depth"].shape == (2, H, W)
    assert np.isfinite(np.asarray(out["depth"])).all()
    m = out["metrics"]
    assert m["mae"].shape == (2,)
    assert np.isfinite(np.asarray(m["mae"])).all()
    # An untrained net still starts from the aligned prior times
    # relu(1+noise): depth should be in a sane metric range.
    assert float(np.asarray(out["depth"]).mean()) > 0


@pytest.mark.slow
def test_sml_train_step_decreases_loss(rng):
    cfg = tiny_config()
    model = ScaleMapLearner(config=cfg.sml)
    state, tx = init_train_state(cfg, model, jax.random.PRNGKey(0),
                                 steps_per_epoch=10)
    step_fn = make_train_step(cfg, model, tx)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_batch(rng, cfg).items()}
    losses = []
    for _ in range(8):
        state, info = step_fn(state, batch)
        losses.append(float(info["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8


def test_rcnet_inference_pipeline(rng):
    cfg = tiny_config()
    model = RCNet(config=cfg.rcnet)
    H, W = cfg.dataset.image_shape
    ph, pw = cfg.rcnet.patch_size
    K = cfg.dataset.max_points

    image = rng.random((H, W, 3)).astype(np.float32)
    padded = pad_image_for_patches(image, cfg.rcnet.patch_size)
    assert padded.shape == (H + ph, W + pw, 3)

    pts = np.zeros((1, K, 3), np.float32)
    mask = np.zeros((1, K), np.float32)
    n_real = 5
    pts[0, :n_real, 0] = rng.integers(0, W, n_real)
    pts[0, :n_real, 1] = rng.integers(0, H, n_real)
    pts[0, :n_real, 2] = rng.random(n_real) * 40 + 2
    mask[0, :n_real] = 1.0

    from riders_tpu.pipelines.rcnet_inference import shift_points_and_boxes
    shifted, boxes = shift_points_and_boxes(jnp.asarray(pts),
                                            cfg.rcnet.patch_size)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(padded)[None],
                           shifted, boxes, jnp.asarray(mask))

    infer = make_rcnet_infer_fn(cfg, model)
    out = infer(variables, {
        "image": jnp.asarray(padded)[None],
        "points": jnp.asarray(pts),
        "point_mask": jnp.asarray(mask)})
    depth = np.asarray(out["depth"])
    assert depth.shape == (1, H, W)
    assert np.isfinite(depth).all()
    # Composed depths must come from the radar z values only.
    nz = depth[depth > 0]
    if nz.size:
        assert nz.min() >= pts[0, :n_real, 2].min() - 1e-4
        assert nz.max() <= pts[0, :n_real, 2].max() + 1e-4
