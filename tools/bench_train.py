"""Measure RC-Net / SML training step time on the real TPU.

Methodology (PERF.md): the tunneled TPU costs ~30 ms per dispatch, so
dispatch N steps back-to-back (each step's state input depends on the
previous step's output, serializing them on device) and block once at the
end; subtract a short run to remove dispatch overhead.

Usage: python tools/bench_train.py [rcnet|sml] [--steps N]
"""

import argparse
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def _rcnet_inputs(cfg, rng, B, K):
    H, W = cfg.dataset.image_shape
    ph, pw = cfg.rcnet.patch_size
    Hp, Wp = H + ph, W + pw
    pts = np.stack([
        rng.integers(pw // 2, Wp - pw // 2, (B, K)),
        rng.integers(ph // 2, Hp - ph // 2, (B, K)),
        rng.random((B, K)) * 40 + 2], axis=-1).astype(np.float32)
    boxes = np.stack([
        pts[..., 0] - pw // 2, pts[..., 1] - ph // 2,
        pts[..., 0] + pw // 2, pts[..., 1] + ph // 2],
        axis=-1).astype(np.float32)
    return {
        "image": rng.random((B, Hp, Wp, 3)).astype(np.float32),
        "points": pts,
        "boxes": boxes,
        "gt_crops": (rng.random((B, K, ph, pw, 1)) * 40).astype(np.float32),
        "point_mask": np.ones((B, K), np.float32),
    }


def bench_rcnet(steps: int):
    from riders_tpu.core.config import zju_config
    from riders_tpu.models.rcnet import RCNet
    from riders_tpu.pipelines.rcnet_training import (
        init_rcnet_train_state, make_rcnet_train_step)

    cfg = zju_config()
    B = cfg.rcnet_train.batch_size            # 4
    K = cfg.rcnet_train.points_per_frame      # 30
    rng = np.random.default_rng(0)
    model = RCNet(config=cfg.rcnet)
    state, tx = init_rcnet_train_state(cfg, model, jax.random.PRNGKey(0),
                                       steps_per_epoch=1000)
    step = make_rcnet_train_step(cfg, model, tx)
    batch = {k: jnp.asarray(v) for k, v in _rcnet_inputs(cfg, rng, B, K).items()}

    def run(n):
        s = state
        t0 = time.time()
        for _ in range(n):
            s, info = step(s, batch)
        jax.block_until_ready(info["loss"])
        return time.time() - t0

    run(2)  # compile + warm
    t_small, t_big = run(3), run(3 + steps)
    ms = (t_big - t_small) / steps * 1e3
    print(f"rcnet train step: {ms:.1f} ms  (batch {B}, K={K}, "
          f"patch {cfg.rcnet.patch_size}) -> {B / ms * 1e3:.1f} frames/s")
    return ms


def bench_sml(steps: int):
    from riders_tpu.core.config import zju_config
    from riders_tpu.models.sml import ScaleMapLearner
    from riders_tpu.pipelines.sml_training import (init_train_state,
                                                   make_train_step)

    cfg = zju_config()
    B = cfg.sml_train.batch_size
    H, W = cfg.dataset.image_shape
    rng = np.random.default_rng(0)
    model = ScaleMapLearner(config=cfg.sml)
    state, tx = init_train_state(cfg, model, jax.random.PRNGKey(0),
                                 steps_per_epoch=1000)
    step = make_train_step(cfg, model, tx)
    depth = (5.0 + 40.0 * rng.random((B, H, W))).astype(np.float32)
    radar = np.where(rng.random((B, H, W)) > 0.995, depth, 0.0
                     ).astype(np.float32)
    batch = {
        "image": jnp.asarray(rng.random((B, H, W, 3)).astype(np.float32)),
        "mono_pred": jnp.asarray(((1.0 / depth) / 0.05).astype(np.float32)),
        "radar": jnp.asarray(radar),
        "rcnet": jnp.asarray(radar),
        "gt_interp": jnp.asarray(depth),
        "gt_sparse": jnp.asarray(radar),
    }

    def run(n):
        s = state
        t0 = time.time()
        for _ in range(n):
            s, info = step(s, batch)
        jax.block_until_ready(info["loss"])
        return time.time() - t0

    run(2)
    t_small, t_big = run(3), run(3 + steps)
    ms = (t_big - t_small) / steps * 1e3
    print(f"sml train step: {ms:.2f} ms  (batch {B}, {cfg.sml.net_shape})"
          f" -> {B / ms * 1e3:.1f} samples/s")
    return ms


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("which", nargs="?", default="rcnet",
                   choices=["rcnet", "sml"])
    p.add_argument("--steps", type=int, default=20)
    args = p.parse_args()
    print(jax.devices(), file=sys.stderr)
    if args.which == "rcnet":
        bench_rcnet(args.steps)
    else:
        bench_sml(args.steps)
