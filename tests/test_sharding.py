"""Sharding-layer tests on the virtual 8-device CPU mesh."""

import numpy as np

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
