"""Integration test: a synthetic on-disk mini-dataset driven through the
manifest -> input pipeline -> training/inference/validation drivers, using
the reference's PNG interchange formats end to end (SURVEY.md 4)."""

import dataclasses
import os

import numpy as np
import pytest

from riders_tpu.core.config import zju_config
from riders_tpu.io import depthio


def make_mini_dataset(root, scenes, n_frames=3, H=96, W=128, seed=0,
                      depth_span=(5.0, 30.0, 10.0)):
    """Synthetic scenes with known geometry: smooth depth field
    (base + a*y/H + b*x/W per `depth_span`), radar returns sampled from
    it, interpolated GT = the true field."""
    rng = np.random.default_rng(seed)
    for scene in scenes:
        for d in ("thermal_undistort", "any", "radar_png", "lidar_png",
                  "lidar_png_int"):
            os.makedirs(os.path.join(root, scene, d), exist_ok=True)
        os.makedirs(os.path.join(root, "output", "rcnet_0.1", scene,
                                 "depth_predicted"), exist_ok=True)
        for f in range(n_frames):
            fid = f"{f:06d}"
            yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
            base, ay, ax = depth_span
            depth = base + ay * (yy / H) + ax * (xx / W) \
                + rng.random((H, W)).astype(np.float32)
            image = np.clip(rng.random((H, W, 3)) * 255, 0, 255
                            ).astype(np.uint8)
            from PIL import Image
            Image.fromarray(image).save(
                os.path.join(root, scene, "thermal_undistort", fid + ".png"))
            # mono prior: inverse depth / 0.05, stored via the x256 codec
            mono = (1.0 / depth) / 0.05
            depthio.save_depth(mono, os.path.join(root, scene, "any",
                                                  fid + ".png"))
            radar = np.zeros((H, W), np.float32)
            idx = rng.integers(0, H * W, 25)
            radar.reshape(-1)[idx] = depth.reshape(-1)[idx]
            depthio.save_depth(radar, os.path.join(root, scene, "radar_png",
                                                   fid + ".png"))
            sparse_gt = np.zeros((H, W), np.float32)
            idx = rng.integers(0, H * W, 300)
            sparse_gt.reshape(-1)[idx] = depth.reshape(-1)[idx]
            depthio.save_depth(sparse_gt, os.path.join(
                root, scene, "lidar_png", fid + ".png"))
            depthio.save_depth(depth, os.path.join(
                root, scene, "lidar_png_int", fid + ".png"))
            depthio.save_depth(radar, os.path.join(
                root, "output", "rcnet_0.1", scene, "depth_predicted",
                fid + ".png"))


@pytest.fixture(scope="module")
def mini_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mini_zju"))
    make_mini_dataset(root, ["scene-a", "scene-b"])
    return root


def mini_config(root):
    cfg = zju_config(root=root)
    return cfg.replace(
        dataset=dataclasses.replace(
            cfg.dataset, image_shape=(96, 128), max_points=16,
            train_scenes=("scene-a",), val_scenes=("scene-b",)),
        sml=dataclasses.replace(cfg.sml, net_shape=(64, 96)),
        rcnet=dataclasses.replace(cfg.rcnet, patch_size=(48, 32)),
        sml_train=dataclasses.replace(
            cfg.sml_train, batch_size=2, n_step_per_checkpoint=2,
            n_step_per_summary=1, learning_schedule=(1, 2)),
        rcnet_train=dataclasses.replace(
            cfg.rcnet_train, batch_size=1, points_per_frame=4,
            n_step_per_checkpoint=2, n_step_per_summary=1,
            learning_schedule=(1,)),
        compute_dtype="float32",
    )


def test_manifest_and_datasets(mini_root):
    from riders_tpu.io.input_pipeline import (
        RCNetTrainDataset, SMLFrameDataset)
    from riders_tpu.io.manifest import build_manifest
    cfg = mini_config(mini_root)
    records = build_manifest(cfg.dataset, ("scene-a",),
                             rcnet_interp="rcnet_0.1")
    assert len(records) == 3
    ds = SMLFrameDataset(cfg, records, train=True, seed=0)
    sample = ds[0]
    assert sample["image"].shape == (96, 128, 3)
    assert sample["rcnet"].shape == (96, 128)
    assert np.isfinite(sample["mono_pred"]).all()

    rc = RCNetTrainDataset(cfg, records, seed=0)
    s = rc[0]
    assert s["image"].shape == (96 + 48, 128 + 32, 3)
    assert s["points"].shape == (4, 3)
    assert s["gt_crops"].shape == (4, 48, 32, 1)


def test_batch_loader_deterministic_across_threads(mini_root):
    """Same seed => identical batches whether samples are produced by 1 or
    4 worker threads (round-1 weak #4: a shared Generator across
    ThreadPoolExecutor workers corrupted the augmentation streams)."""
    from riders_tpu.io.input_pipeline import BatchLoader, SMLFrameDataset
    from riders_tpu.io.manifest import build_manifest
    cfg = mini_config(mini_root)
    records = build_manifest(cfg.dataset, ("scene-a",),
                             rcnet_interp="rcnet_0.1")

    def collect(num_threads):
        ds = SMLFrameDataset(cfg, records, train=True, seed=7)
        loader = BatchLoader(ds, batch_size=2, shuffle=True,
                             num_threads=num_threads, seed=3,
                             device_put=False)
        return [b for _ in range(2) for b in loader.epoch()]

    a, b = collect(1), collect(4)
    assert len(a) == len(b) > 0
    for ba, bb in zip(a, b):
        for k in ba:
            np.testing.assert_array_equal(np.asarray(ba[k]),
                                          np.asarray(bb[k]))
    # epochs must differ (set_epoch advances the augmentation stream)
    assert not all(
        np.array_equal(np.asarray(a[0][k]), np.asarray(a[1][k]))
        for k in a[0])


def test_batch_loader_process_pool_matches_threads(mini_root):
    """num_workers>0 (process-pool decode, the host-fed serving path -
    PERF.md: thread decode is GIL-bound zlib) must yield byte-identical
    batches to the threaded loader, across epochs (set_epoch rides along
    with each task)."""
    from riders_tpu.io.input_pipeline import BatchLoader, SMLFrameDataset
    from riders_tpu.io.manifest import build_manifest
    cfg = mini_config(mini_root)
    records = build_manifest(cfg.dataset, ("scene-a",),
                             rcnet_interp="rcnet_0.1")

    def collect(**kw):
        ds = SMLFrameDataset(cfg, records, train=True, seed=7)
        loader = BatchLoader(ds, batch_size=2, shuffle=True, seed=3,
                             device_put=False, **kw)
        try:
            return [b for _ in range(2) for b in loader.epoch()]
        finally:
            loader.close()

    a = collect(num_threads=2)
    b = collect(num_workers=2)
    assert len(a) == len(b) > 0
    for ba, bb in zip(a, b):
        for k in ba:
            np.testing.assert_array_equal(np.asarray(ba[k]),
                                          np.asarray(bb[k]))


def test_rcnet_point_noise(mini_root):
    """Per-point noise (rcnet_transforms.py:158-168,398-432): perturbs the
    points fed to the encoder, leaves boxes/crops at un-noised geometry."""
    from riders_tpu.io.input_pipeline import RCNetTrainDataset
    from riders_tpu.io.manifest import build_manifest
    cfg = mini_config(mini_root)
    records = build_manifest(cfg.dataset, ("scene-a",),
                             rcnet_interp="rcnet_0.1")
    cfg_n = cfg.replace(rcnet_train=dataclasses.replace(
        cfg.rcnet_train, random_noise_type="gaussian",
        random_noise_spread=2.0))
    cfg_u = cfg.replace(rcnet_train=dataclasses.replace(
        cfg.rcnet_train, random_noise_type="uniform",
        random_noise_spread=1.0))

    # the noise gate is Bernoulli(0.5) per sample; sweep seeds so at least
    # one fires, and check invariants on every draw
    fired = 0
    for seed in range(8):
        base = RCNetTrainDataset(cfg, records, seed=seed)[0]
        noised = RCNetTrainDataset(cfg_n, records, seed=seed)[0]
        np.testing.assert_array_equal(noised["boxes"], base["boxes"])
        np.testing.assert_array_equal(noised["gt_crops"], base["gt_crops"])
        if not np.allclose(noised["points"], base["points"]):
            fired += 1
        uni = RCNetTrainDataset(cfg_u, records, seed=seed)[0]
        assert np.abs(uni["points"] - base["points"]).max() <= 0.5 + 1e-6
    assert fired > 0


@pytest.mark.slow
def test_sml_training_and_validation_roundtrip(mini_root, tmp_path):
    from riders_tpu.pipelines.drivers import (
        evaluate_results_dir, train_sml, validate_sml)
    cfg = mini_config(mini_root)
    ckpt_dir = str(tmp_path / "sml_ckpt")
    train_sml(cfg, ckpt_dir, max_steps=2)

    from riders_tpu.core.checkpoint import latest_step
    assert latest_step(ckpt_dir) == 2

    out_dir = str(tmp_path / "out")
    best = validate_sml(cfg, ckpt_dir, output_path=out_dir,
                        save_output=True, batch_size=2)
    assert np.isfinite(best["mae"])
    assert best["step"] == 2

    # the saved PNGs score identically through the offline comparator
    results = evaluate_results_dir(cfg, os.path.join(out_dir, "SML"))
    assert np.isfinite(results["mae"])
    assert abs(results["delta1"] - best["delta1"]) < 0.05


@pytest.mark.slow
def test_train_sml_data_parallel_over_mesh(mini_root, tmp_path):
    """The training drivers shard batches over the device mesh when more
    than one device is visible (the DataParallel replacement actually
    wired into the product loop, not just the step-fn tests).  On the
    conftest's 8 virtual CPU devices a batch of 2 auto-fits a 2-way data
    mesh; loss must stay finite and checkpoints must save."""
    import jax

    assert len(jax.devices()) >= 2
    from riders_tpu.core.checkpoint import latest_step
    from riders_tpu.pipelines.drivers import _maybe_shard_training, train_sml

    cfg = mini_config(mini_root)
    # the wrapper must actually engage for this batch size
    _, sharding = _maybe_shard_training(cfg, lambda s, b: (s, b),
                                        cfg.sml_train.batch_size)
    assert sharding is not None

    ckpt_dir = str(tmp_path / "sml_dp_ckpt")
    train_sml(cfg, ckpt_dir, max_steps=2)
    assert latest_step(ckpt_dir) == 2


@pytest.mark.slow
def test_validate_sml_interp_modes(mini_root, tmp_path):
    """The non-RCNet scale-map paths (val_zju.py:81-84, 176-179;
    modules/interpolator.py): 'none' = raw radar knots, 'interp' = dense
    IDW knot interpolation.  Neither requires stage-2 outputs on disk."""
    from riders_tpu.pipelines.drivers import train_sml, validate_sml
    cfg = mini_config(mini_root)
    ckpt_dir = str(tmp_path / "sml_ckpt_interp")

    results = {}
    for mode in ("none", "interp", "interp-exact"):
        mcfg = cfg.replace(sml_train=dataclasses.replace(
            cfg.sml_train, rcnet_interp=mode))
        if mode == "none":
            train_sml(mcfg, ckpt_dir, max_steps=1)
        best = validate_sml(mcfg, ckpt_dir, batch_size=2)
        assert np.isfinite(best["mae"]) and best["step"] > 0
        results[mode] = best
    # the two modes build different scale maps -> different metrics
    assert results["none"]["mae"] != results["interp"]["mae"]

    # Quantify the device-IDW approximation against the host-exact
    # griddata path (round-2 VERDICT weak #6) and record it in PARITY.md.
    from parity_common import METRIC_KEYS, write_fragment
    idw = {k: float(results["interp"][k]) for k in METRIC_KEYS}
    exact = {k: float(results["interp-exact"][k]) for k in METRIC_KEYS}
    max_rel = max(abs(idw[k] - exact[k]) / max(abs(exact[k]), 1e-9)
                  for k in METRIC_KEYS)
    write_fragment("interp", {"idw": idw, "exact": exact,
                              "max_rel": max_rel})


@pytest.mark.slow
def test_rcnet_training_and_generation(mini_root, tmp_path):
    from riders_tpu.pipelines.drivers import run_rcnet, train_rcnet
    cfg = mini_config(mini_root)
    ckpt_dir = str(tmp_path / "rc_ckpt")
    train_rcnet(cfg, ckpt_dir, max_steps=2)

    # training observability: image mosaic per checkpoint step
    # (rcnet_model.log_summary:267-476 equivalent) + P/R scalars
    assert os.path.exists(os.path.join(ckpt_dir, "summaries",
                                       "step2.png"))
    import json
    with open(os.path.join(ckpt_dir, "scalars-train.jsonl")) as f:
        lines = [json.loads(l) for l in f.readlines()]
    scalars = [l for l in lines if "histograms" not in l]
    hists = [l["histograms"] for l in lines if "histograms" in l]
    assert "precision" in scalars[-1] and "recall" in scalars[-1]
    assert hists and "response" in hists[-1]
    assert 0.0 <= hists[-1]["response"]["median"] <= 1.0

    out_root = str(tmp_path / "rcnet_out")
    run_rcnet(cfg, ckpt_dir, out_root, scenes=("scene-b",),
              save_color=False)
    thr = f"rcnet_{cfg.rcnet.response_threshold}"
    produced = os.listdir(os.path.join(out_root, thr, "scene-b",
                                       "depth_predicted"))
    assert len(produced) == 3
    d = depthio.load_depth(os.path.join(out_root, thr, "scene-b",
                                        "depth_predicted", produced[0]))
    assert d.shape == (96, 128)


@pytest.mark.slow
def test_checkpoint_resume(mini_root, tmp_path):
    from riders_tpu.core.checkpoint import latest_step
    from riders_tpu.pipelines.drivers import train_sml
    cfg = mini_config(mini_root)
    # 4 epochs x 1 step/epoch so the resumed run has room to advance
    cfg = cfg.replace(sml_train=dataclasses.replace(
        cfg.sml_train, learning_schedule=(1, 4)))
    ckpt_dir = str(tmp_path / "resume_ckpt")
    train_sml(cfg, ckpt_dir, max_steps=2)
    train_sml(cfg, ckpt_dir, resume=True, max_steps=4)
    assert latest_step(ckpt_dir) == 4
