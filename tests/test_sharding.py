"""Sharding-layer tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from riders_tpu.parallel import sharding as sh


def test_mesh_shapes():
    mesh = sh.make_mesh()
    assert mesh.devices.size == len(jax.devices())
    mesh2 = sh.make_mesh(n_data=4, n_points=2)
    assert mesh2.devices.shape == (4, 2)
    assert mesh2.axis_names == (sh.DATA_AXIS, sh.POINTS_AXIS)


def test_mesh_undersupply_raises():
    """Asking for more devices than exist must fail loudly, not with an
    opaque reshape error (round-1 weak #3)."""
    import pytest

    with pytest.raises(ValueError, match="have 8"):
        sh.make_mesh(n_data=8, n_points=2)
    with pytest.raises(ValueError, match="have 1"):
        sh.make_mesh(n_data=4, n_points=2, devices=jax.devices()[:1])
    with pytest.raises(ValueError, match="n_points"):
        sh.make_mesh(n_data=-1, n_points=16)
    with pytest.raises(ValueError, match="n_points must be"):
        sh.make_mesh(n_data=1, n_points=0)


@pytest.mark.slow
def test_dryrun_subprocess_reexec():
    """dryrun_multichip must self-recover when the process has too few
    devices by re-exec'ing with a forced virtual mesh (round-1 weak #1).
    Exercise the argument plumbing with a tiny n that the subprocess can
    satisfy; the in-process branch is covered by the conftest's 8 devices."""
    import subprocess
    import sys
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # subprocess must set its own device count
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    res = subprocess.run(
        [sys.executable, os.path.join(repo, "__graft_entry__.py"),
         "--dryrun", "2"],
        env=env, capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stderr
    assert "dryrun_multichip ok on 2 devices" in res.stdout


def test_shard_batch_layouts(rng):
    mesh = sh.make_mesh(n_data=4, n_points=2)
    batch = {
        "image": rng.random((8, 16, 16, 3)).astype(np.float32),
        "points": rng.random((8, 4, 3)).astype(np.float32),
        "point_mask": np.ones((8, 4), np.float32),
    }
    sharded = sh.shard_batch(mesh, batch)
    assert sharded["image"].sharding.spec == P(sh.DATA_AXIS, None, None,
                                               None)
    assert sharded["points"].sharding.spec == P(sh.DATA_AXIS,
                                                sh.POINTS_AXIS, None)
    np.testing.assert_array_equal(np.asarray(sharded["image"]),
                                  batch["image"])


@pytest.mark.slow
def test_points_sharded_fused_inference_matches_unsharded(rng):
    """The fused pipeline over a (data=4, points=2) mesh - the B x K patch
    axis actually split across devices - must match the unsharded result
    (MeshConfig.points_parallel consumed by a real pipeline)."""
    import dataclasses

    from riders_tpu.core.config import zju_config
    from riders_tpu.models.rcnet import RCNet
    from riders_tpu.models.sml import ScaleMapLearner
    from riders_tpu.pipelines.fused import make_fused_fn, make_sharded_fused_fn

    cfg = zju_config()
    cfg = cfg.replace(
        dataset=dataclasses.replace(cfg.dataset, image_shape=(96, 128),
                                    max_points=8),
        sml=dataclasses.replace(cfg.sml, net_shape=(64, 96)),
        rcnet=dataclasses.replace(cfg.rcnet, patch_size=(48, 32)),
        mesh=dataclasses.replace(cfg.mesh, data_parallel=4,
                                 points_parallel=2),
    )
    rcnet = RCNet(config=cfg.rcnet)
    sml = ScaleMapLearner(config=cfg.sml)

    H, W = cfg.dataset.image_shape
    K = cfg.dataset.max_points
    ph, pw = cfg.rcnet.patch_size
    B = 4

    depth = (5.0 + 40.0 * rng.random((B, H, W))).astype(np.float32)
    pts = np.zeros((B, K, 3), np.float32)
    mask = np.zeros((B, K), np.float32)
    for b in range(B):
        u = rng.integers(0, W, 6)
        v = rng.integers(0, H, 6)
        pts[b, :6] = np.stack([u, v, depth[b, v, u]], axis=1)
        mask[b, :6] = 1.0
    batch = {
        "image": rng.random((B, H, W, 3)).astype(np.float32),
        "mono_pred": ((1.0 / depth) / 0.05).astype(np.float32),
        "radar_points": pts,
        "point_mask": mask,
    }

    tiny_img = jnp.zeros((1, 32 + ph, 32 + pw, 3))
    tiny_pts = jnp.asarray([[[pw / 2, ph / 2, 10.0]]], jnp.float32)
    tiny_box = jnp.asarray([[[0.0, 0.0, float(pw), float(ph)]]],
                           jnp.float32)
    rc_vars = jax.jit(rcnet.init)(jax.random.PRNGKey(0), tiny_img,
                                  tiny_pts, tiny_box, jnp.ones((1, 1)))
    h, w = cfg.sml.net_shape
    sml_vars = jax.jit(sml.init)(jax.random.PRNGKey(1),
                                 jnp.zeros((1, h, w, 3)),
                                 jnp.ones((1, h, w, 1)))

    single = make_fused_fn(cfg, rcnet, sml)(
        jax.device_put(rc_vars, jax.devices()[0]),
        jax.device_put(sml_vars, jax.devices()[0]),
        {k: jax.device_put(v, jax.devices()[0]) for k, v in batch.items()})

    sharded_fn = make_sharded_fused_fn(cfg, rcnet, sml)
    sharded = np.asarray(sharded_fn(rc_vars, sml_vars, batch))
    single = np.asarray(single)

    # Partitioned reductions (alignment solve, scale-map min/max) reorder
    # floating-point sums, so isolated pixels can differ at ~1e-4 relative;
    # require near-exactness in aggregate and bounded worst-case.
    err = np.abs(sharded - single) / (np.abs(single) + 1e-3)
    assert np.mean(err) < 1e-6, float(np.mean(err))
    assert np.max(err) < 5e-3, float(np.max(err))


def test_data_parallel_step_matches_single_device(rng):
    """A gradient step under with_data_sharding must equal the unsharded
    result (XLA inserts the all-reduce)."""
    import optax
    from flax import struct

    class S(struct.PyTreeNode):
        w: jnp.ndarray

    tx = optax.sgd(0.1)

    def step(state_and_opt, batch):
        state, opt_state = state_and_opt

        def loss_fn(w):
            pred = batch["x"] @ w
            return jnp.mean((pred - batch["y"]) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(state.w)
        updates, opt_state = tx.update(g, opt_state, state.w)
        return (S(w=optax.apply_updates(state.w, updates)), opt_state), loss

    w0 = rng.random((6, 1)).astype(np.float32)
    x = rng.random((8, 6)).astype(np.float32)
    y = rng.random((8, 1)).astype(np.float32)
    batch = {"x": x, "y": y}
    init = (S(w=jnp.asarray(w0)), tx.init(jnp.asarray(w0)))

    (ref_state, _), ref_loss = jax.jit(step)(init, batch)

    mesh = sh.make_mesh(n_data=8, n_points=1)
    with mesh:
        sharded_step = sh.with_data_sharding(mesh, jax.jit(step))
        (out_state, _), loss = sharded_step(init, batch)

    np.testing.assert_allclose(np.asarray(out_state.w),
                               np.asarray(ref_state.w), atol=1e-6)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-6)
