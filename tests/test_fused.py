"""CPU test of the fully-fused three-stage pipeline (pipelines/fused.py)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from riders_tpu.core.config import zju_config
from riders_tpu.models.rcnet import RCNet
from riders_tpu.models.sml import ScaleMapLearner
from riders_tpu.pipelines.fused import make_fused_fn


@pytest.mark.slow
def test_fused_pipeline_end_to_end(rng):
    cfg = zju_config()
    cfg = cfg.replace(
        dataset=dataclasses.replace(cfg.dataset, image_shape=(96, 128),
                                    max_points=8),
        sml=dataclasses.replace(cfg.sml, net_shape=(64, 96)),
        rcnet=dataclasses.replace(cfg.rcnet, patch_size=(48, 32)),
    )
    rcnet = RCNet(config=cfg.rcnet)
    sml = ScaleMapLearner(config=cfg.sml)

    H, W = cfg.dataset.image_shape
    K = cfg.dataset.max_points
    ph, pw = cfg.rcnet.patch_size
    B = 2

    depth = (5.0 + 40.0 * rng.random((B, H, W))).astype(np.float32)
    pts = np.zeros((B, K, 3), np.float32)
    mask = np.zeros((B, K), np.float32)
    for b in range(B):
        u = rng.integers(0, W, 5)
        v = rng.integers(0, H, 5)
        pts[b, :5] = np.stack([u, v, depth[b, v, u]], axis=1)
        mask[b, :5] = 1.0
    batch = {
        "image": jnp.asarray(rng.random((B, H, W, 3)).astype(np.float32)),
        "mono_pred": jnp.asarray(((1.0 / depth) / 0.05).astype(np.float32)),
        "radar_points": jnp.asarray(pts),
        "point_mask": jnp.asarray(mask),
    }

    tiny_img = jnp.zeros((1, 32 + ph, 32 + pw, 3))
    tiny_pts = jnp.asarray([[[pw / 2, ph / 2, 10.0]]], jnp.float32)
    tiny_box = jnp.asarray([[[0.0, 0.0, float(pw), float(ph)]]], jnp.float32)
    rc_vars = jax.jit(rcnet.init)(jax.random.PRNGKey(0), tiny_img, tiny_pts,
                                  tiny_box, jnp.ones((1, 1)))
    h, w = cfg.sml.net_shape
    sml_vars = jax.jit(sml.init)(jax.random.PRNGKey(1),
                                 jnp.zeros((1, h, w, 3)),
                                 jnp.ones((1, h, w, 1)))

    fused = make_fused_fn(cfg, rcnet, sml)
    out = fused(rc_vars, sml_vars, batch)
    d = np.asarray(out)
    assert d.shape == (B, H, W)
    assert np.isfinite(d).all()
    # bicubic upsampling of 1/pred can overshoot slightly negative at sharp
    # transitions (the reference's val_zju.py:200-210 is equally unclamped);
    # the bulk of the map must be positive metric depth
    assert np.mean(d > 0) > 0.95
    assert d.mean() > 1.0

    # ---- compact staging: uint8 image + uint16 PNG16 codes ----
    # The fused fn's dtype dispatch normalizes/decodes on device; the
    # compact batch must reproduce the f32 result (identical up to the
    # one-ulp difference between x/255 and x*(1/255) ahead of the bf16
    # model casts).
    img_u8 = (np.asarray(batch["image"]) * 255).round().astype(np.uint8)
    mono_u16 = (np.asarray(batch["mono_pred"]) * 256).astype(np.uint16)
    compact = {
        "image": jnp.asarray(img_u8),
        "mono_pred": jnp.asarray(mono_u16),
        "radar_points": batch["radar_points"],
        "point_mask": batch["point_mask"],
    }
    f32_equiv = {
        "image": jnp.asarray(img_u8.astype(np.float32) / 255.0),
        "mono_pred": jnp.asarray(mono_u16.astype(np.float32) / 256.0),
        "radar_points": batch["radar_points"],
        "point_mask": batch["point_mask"],
    }
    d_compact = np.asarray(fused(rc_vars, sml_vars, compact))
    d_f32 = np.asarray(fused(rc_vars, sml_vars, f32_equiv))
    np.testing.assert_allclose(d_compact, d_f32, rtol=1e-4, atol=1e-3)

    # ---- FusedInferenceDataset: on-disk roundtrip, both modes ----
    import tempfile

    from PIL import Image

    from riders_tpu.io import depthio
    from riders_tpu.pipelines.serving import FusedInferenceDataset

    with tempfile.TemporaryDirectory() as root:
        names = []
        for b in range(B):
            name = f"f{b:02d}"
            base = f"{root}/{name}"
            Image.fromarray(img_u8[b]).save(base + "_image.png")
            depthio.save_depth(np.asarray(batch["mono_pred"][b]),
                               base + "_mono.png")
            np.save(base + "_radar.npy", pts[b][: int(mask[b].sum())])
            names.append(name)
        ds_f32 = FusedInferenceDataset(names, root=root, max_points=K)
        ds_c = FusedInferenceDataset(names, root=root, max_points=K,
                                     compact=True)
        s_f32, s_c = ds_f32[0], ds_c[0]
        assert s_c["image"].dtype == np.uint8
        assert s_c["mono_pred"].dtype == np.uint16
        np.testing.assert_allclose(
            s_c["image"].astype(np.float32) / 255.0, s_f32["image"],
            atol=1e-6)
        np.testing.assert_allclose(
            s_c["mono_pred"].astype(np.float32) / 256.0,
            s_f32["mono_pred"], atol=1e-6)
        np.testing.assert_array_equal(s_c["radar_points"],
                                      s_f32["radar_points"])

    # ---- FusedServer: pipelined serving over the same fn ----
    import threading

    from riders_tpu.pipelines.serving import FusedServer

    host_batch = {k: np.asarray(v) for k, v in batch.items()}
    server = FusedServer(fused, rc_vars, sml_vars, depth=2)

    n_before = threading.active_count()
    outs = list(server.run(iter([host_batch] * 4)))
    assert len(outs) == 4
    np.testing.assert_allclose(outs[0], d, rtol=1e-5, atol=1e-5)
    assert threading.active_count() == n_before  # uploader joined

    # abandoning the stream early still stops + joins the uploader
    gen = server.run(iter([host_batch] * 8))
    first = next(gen)
    assert first.shape == (B, H, W)
    gen.close()
    assert threading.active_count() == n_before


def test_adaptive_threshold_closed_form_matches_loop(rng):
    """adaptive_threshold_value + one compose must equal the bounded
    retry loop (run_rcnet_zju.py:254-264) for rich, sparse and empty
    response patterns."""
    from riders_tpu.ops.patches import (adaptive_compose,
                                        adaptive_threshold_value,
                                        compose_patches)

    img, patch = (64, 80), (24, 16)
    K = 5
    pts = np.stack([rng.integers(8, 88, K), rng.integers(12, 76, K),
                    rng.random(K) * 40 + 2], -1).astype(np.float32)
    mask = np.ones(K, np.float32)
    cases = [
        rng.random((K, *patch)).astype(np.float32),          # rich
        rng.random((K, *patch)).astype(np.float32) * 0.26,   # needs decay
        np.zeros((K, *patch), np.float32),                   # empty
        np.full((K, *patch), 0.08, np.float32),              # deep decay
    ]
    for resp in cases:
        d_loop, r_loop, thr_loop = adaptive_compose(
            jnp.asarray(resp), jnp.asarray(pts), jnp.asarray(mask),
            img, patch, 0.4, 0.05, 8)
        thr = adaptive_threshold_value(jnp.asarray(resp), jnp.asarray(mask),
                                       0.4, 0.05, 8)
        d_one, r_one = compose_patches(
            jnp.asarray(resp), jnp.asarray(pts), jnp.asarray(mask),
            img, patch, thr)
        np.testing.assert_allclose(float(thr), float(thr_loop), atol=1e-6)
        np.testing.assert_allclose(np.asarray(d_one), np.asarray(d_loop),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(r_one), np.asarray(r_loop),
                                   atol=1e-6)


def test_fused_server_streams_in_order(rng):
    """FusedServer must yield every batch's result in order, and join its
    uploader thread on early abandonment."""
    import threading

    from riders_tpu.pipelines.serving import FusedServer

    @jax.jit
    def fake_fused(rc_vars, sml_vars, batch):
        return batch["x"] * rc_vars["scale"] + sml_vars["shift"]

    rc_vars = {"scale": jnp.float32(2.0)}
    sml_vars = {"shift": jnp.float32(1.0)}
    batches = [{"x": np.full((4, 8), float(i), np.float32)}
               for i in range(7)]

    server = FusedServer(fake_fused, rc_vars, sml_vars, depth=2)
    outs = list(server.run(iter(batches)))
    assert len(outs) == 7
    for i, o in enumerate(outs):
        np.testing.assert_allclose(o, 2.0 * i + 1.0)

    # Early abandonment: take one result, close the generator; no thread
    # leak.
    n0 = threading.active_count()
    gen = server.run(iter(batches))
    first = next(gen)
    np.testing.assert_allclose(first, 1.0)
    gen.close()
    assert threading.active_count() <= n0 + 1
