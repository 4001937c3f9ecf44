"""End-to-end accuracy parity against the ACTUAL PyTorch reference.

This is the round-1 VERDICT's Missing #1: run the reference's own
validation protocol (/root/reference/val_zju.py:24-307 - its Optimizer,
UTV loader, transforms, MidasNet_small_videpth and eval_utils) on the
synthetic mini-scenes, run the riders_tpu fused pipeline with the SAME
weights (via models/convert), and hold all 7 metrics to the <=1% budget
of BASELINE.json.

Environment notes:
* torchvision and timm are not installed here and torch.hub has no
  egress.  torchvision is pure glue on this path (transforms.Compose, and
  functional adjusters that get_transforms disables), so a minimal stub
  is installed; the hub efficientnet-lite3 download is replaced by a
  local torch twin built from the fp32-exact gen-efficientnet blocks of
  tests/test_convert_sml.py with the full lite3 stage plan.
* Everything numeric on the reference path (alignment, scale-map
  synthesis, resize conventions, network forward, metric formulas) is the
  reference's own code, unmodified.

Running this file writes PARITY.md at the repo root with the numbers.
"""

import dataclasses
import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference tree not mounted")

METRIC_KEYS = ("mae", "rmse", "imae", "irmse", "abs_rel", "sq_rel",
               "delta1")
BUDGET = 0.01  # <=1% deviation per BASELINE.json


def _install_torchvision_stub():
    """modules/midas/transforms.py imports torchvision only for
    transforms.Compose and functional color adjusters that
    get_transforms(...) leaves disabled (random_* = None); utils/log_utils
    uses make_grid only in TB summaries outside the validate path.
    RCNet/networks.py additionally needs ops.roi_pool and
    rcnet_main.forward_output needs transforms.functional.pad - both get
    faithful pure-torch implementations (`_roi_pool_torch`, edge pad)."""
    if "torchvision" in sys.modules:
        _attach_torchvision_ops(sys.modules["torchvision"])
        return
    tv = types.ModuleType("torchvision")
    tvt = types.ModuleType("torchvision.transforms")
    tvf = types.ModuleType("torchvision.transforms.functional")
    tvu = types.ModuleType("torchvision.utils")

    class Compose:
        def __init__(self, fns):
            self.fns = fns

        def __call__(self, sample):
            for f in self.fns:
                sample = f(sample)
            return sample

    tvt.Compose = Compose
    tvt.functional = tvf
    tv.transforms = tvt
    tv.utils = tvu
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tvt
    sys.modules["torchvision.transforms.functional"] = tvf
    sys.modules["torchvision.utils"] = tvu
    _attach_torchvision_ops(tv)


def _roi_pool_torch(input, boxes, output_size, spatial_scale=1.0):
    """torchvision.ops.roi_pool reproduced in pure torch: round-half-away
    start/end, legacy +1 extent, float bin boundaries, border clamp,
    empty bins -> 0 (the C++ kernel's arithmetic, scalarized)."""
    import math

    import torch

    if isinstance(boxes, (list, tuple)):
        rois = torch.cat(
            [torch.cat([torch.full((b.shape[0], 1), float(i)), b.float()],
                       dim=1) for i, b in enumerate(boxes)], dim=0)
    else:
        rois = boxes.float()
    B, C, H, W = input.shape
    ph, pw = output_size
    out = torch.zeros((rois.shape[0], C, ph, pw), dtype=input.dtype)

    def r(v):
        return int(math.floor(v * spatial_scale + 0.5))

    for n in range(rois.shape[0]):
        bi = int(rois[n, 0])
        x1, y1, x2, y2 = (r(float(rois[n, i])) for i in (1, 2, 3, 4))
        rw = max(x2 - x1 + 1, 1)
        rh = max(y2 - y1 + 1, 1)
        bh = rh / float(ph)
        bw = rw / float(pw)
        for py in range(ph):
            hs = min(max(int(math.floor(py * bh)) + y1, 0), H)
            he = min(max(int(math.ceil((py + 1) * bh)) + y1, 0), H)
            for px in range(pw):
                ws = min(max(int(math.floor(px * bw)) + x1, 0), W)
                we = min(max(int(math.ceil((px + 1) * bw)) + x1, 0), W)
                if he > hs and we > ws:
                    out[n, :, py, px] = input[bi, :, hs:he, ws:we].amax(
                        dim=(-2, -1))
    return out


def _attach_torchvision_ops(tv):
    import types as _types

    import torch
    import torch.nn.functional as F

    if not hasattr(tv, "ops"):
        ops = _types.ModuleType("torchvision.ops")
        tv.ops = ops
        sys.modules["torchvision.ops"] = ops
    tv.ops.roi_pool = _roi_pool_torch

    def pad(img, padding, padding_mode="constant", fill=0):
        l, t, r_, b = padding
        if padding_mode == "edge":
            x = img[None] if img.dim() == 3 else img
            x = F.pad(x, (l, r_, t, b), mode="replicate")
            return x[0] if img.dim() == 3 else x
        return F.pad(img, (l, r_, t, b), value=fill)

    tv.transforms.functional.pad = pad

    # timm is only reached through val_zju's DPTDepthModel import chain;
    # the midas-small path never calls it.  beit.py needs one name at
    # import time.
    tm = types.ModuleType("timm")
    tmm = types.ModuleType("timm.models")
    tmb = types.ModuleType("timm.models.beit")

    def gen_relative_position_index(*a, **k):  # never called on this path
        raise NotImplementedError("timm stub")

    tmb.gen_relative_position_index = gen_relative_position_index
    tml = types.ModuleType("timm.models.layers")

    def get_act_layer(name):  # never called on this path
        raise NotImplementedError("timm stub")

    tml.get_act_layer = get_act_layer
    tmm.beit = tmb
    tmm.layers = tml
    tm.models = tmm
    sys.modules["timm"] = tm
    sys.modules["timm.models"] = tmm
    sys.modules["timm.models.beit"] = tmb
    sys.modules["timm.models.layers"] = tml


def _build_torch_lite3():
    """Local torch twin of gen-efficientnet tf_efficientnet_lite3: the
    exact module layout _make_efficientnet_backbone slices
    (modules/midas/blocks.py:54-64), using the blocks proven fp32-exact
    against flax in tests/test_convert_sml.py."""
    import torch.nn as nn

    from test_convert_sml import TDS, TMB, Conv2dSame
    from riders_tpu.models.efficientnet import LITE3_STAGES

    stem = 32

    def make_stage(si):
        k, s, e, c, r = LITE3_STAGES[si]
        cin = stem if si == 0 else LITE3_STAGES[si - 1][3]
        blocks = []
        for j in range(r):
            b_in = cin if j == 0 else c
            stride = s if j == 0 else 1
            blocks.append(TDS(b_in, c, k, stride) if e == 1
                          else TMB(b_in, c, k, stride, e))
        return nn.Sequential(*blocks)

    eff = nn.Module()
    eff.conv_stem = Conv2dSame(3, stem, 3, 2, bias=False)
    eff.bn1 = nn.BatchNorm2d(stem, eps=1e-3)
    eff.act1 = nn.ReLU6(inplace=True)
    eff.blocks = nn.Sequential(*[make_stage(i) for i in range(7)])
    return eff


@pytest.fixture(scope="module")
def reference_env():
    """Import the reference with the torchvision stub and a hub patch."""
    _install_torchvision_stub()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import torch

    orig_hub_load = torch.hub.load

    def fake_hub_load(repo, model, pretrained=False, exportable=True, **kw):
        assert model == "tf_efficientnet_lite3", model
        return _build_torch_lite3()

    torch.hub.load = fake_hub_load
    try:
        import val_zju
        yield val_zju
    finally:
        torch.hub.load = orig_hub_load


@pytest.fixture(scope="module")
def mini_root(tmp_path_factory):
    from test_drivers import make_mini_dataset
    root = str(tmp_path_factory.mktemp("parity_zju"))
    make_mini_dataset(root, ["scene-a", "scene-b"])
    return root


def _mini_cfg(root):
    from test_drivers import mini_config
    return mini_config(root)


@pytest.fixture(scope="module")
def reference_model(reference_env):
    """The reference SML with deterministic random weights and perturbed
    BN statistics (so batch-norm folding is actually exercised)."""
    import torch
    import torch.nn as nn
    from modules.midas.midas_net_custom import MidasNet_small_videpth

    torch.manual_seed(0)
    model = MidasNet_small_videpth(device="cpu", min_pred=0.1,
                                   max_pred=255.0, in_channels=3)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.normal_(1.0, 0.1)
                m.bias.normal_(0, 0.1)
    model.eval()
    return model


def _run_reference_validation(val_zju, model, root, scenes,
                               net=(96, 64)):
    import modules.midas.transforms as ref_transforms

    val_zju.result_root = os.path.join(root, "output")
    val_zju.min_pred = 0.1
    val_zju.max_pred = 255.0
    # default net_w=96, net_h=64: the 'minimal' multiple-of-32 resize of
    # the 96x128 mini frames (matches mini_config's sml.net_shape)
    tfm = ref_transforms.get_transforms(net[0], net[1],
                                        depth_predictor="midas_small")
    best = {"step": -1, "mae": np.inf, "rmse": np.inf, "imae": np.inf,
            "irmse": np.inf, "abs_rel": np.inf, "sq_rel": np.inf,
            "delta1": 0.0}
    import torch
    with torch.no_grad():
        best = val_zju.validate(
            best_results=best, ScaleMapLearner=model, step=0,
            ScaleMapLearner_transform=tfm,
            min_depth_inference=0.0, max_depth_inference=100.0,
            min_depth_val=0.0, max_depth_val=50.0,
            input_path=root, output_path=None, scenes=list(scenes),
            save_output=False, interp="rcnet_0.1", global_alignment="s",
            mono_type="inv", mono_model="any")
    return {k: float(best[k]) for k in METRIC_KEYS}


def _riders_variables(model_sd):
    from riders_tpu.models import convert
    sd = {k: np.asarray(v.detach().cpu().numpy())
          for k, v in model_sd.items()}
    return convert.convert_sml_state_dict(sd)


def _run_riders_validation(cfg, variables, scenes):
    import jax

    from riders_tpu.io.input_pipeline import BatchLoader, SMLFrameDataset
    from riders_tpu.io.manifest import build_manifest
    from riders_tpu.models.factory import build_sml_model
    from riders_tpu.pipelines.sml_inference import make_infer_fn

    records = build_manifest(cfg.dataset, scenes, rcnet_interp="rcnet_0.1")
    dataset = SMLFrameDataset(cfg, records, train=False)
    loader = BatchLoader(dataset, batch_size=1, shuffle=False,
                         drop_last=False)
    model = build_sml_model(cfg)
    infer = make_infer_fn(cfg, model, with_metrics=True)
    per_frame = {k: [] for k in METRIC_KEYS}
    for batch in loader.epoch():
        m = jax.device_get(infer(variables, batch)["metrics"])
        for k in METRIC_KEYS:
            per_frame[k].append(float(np.asarray(m[k]).reshape(-1)[0]))
    return {k: float(np.mean(v)) for k, v in per_frame.items()}


def _write_parity_md(ref, riders, rel):
    from parity_common import write_fragment
    write_fragment("main", {"ref": ref, "riders": riders, "rel": rel})


def test_stage1_intermediate_parity(reference_env, mini_root):
    """int_depth / int_scales at full res: reference Optimizer + numpy
    synthesis vs riders alignment/scale_map ops (val_zju.py:130-179)."""
    import jax.numpy as jnp
    from modules.estimator import Optimizer
    import modules.midas.utils as mutils

    from riders_tpu.io import depthio
    from riders_tpu.ops import alignment, scale_map

    cfg = _mini_cfg(mini_root)
    sroot = os.path.join(mini_root, "scene-b")
    mono = depthio.load_depth(os.path.join(sroot, "any", "000000.png"))
    radar = depthio.load_depth(
        os.path.join(sroot, "radar_png", "000000.png"))
    rcnet = depthio.load_depth(os.path.join(
        mini_root, "output", "rcnet_0.1", "scene-b", "depth_predicted",
        "000000.png"))

    # --- reference side (val_zju.py:130-179, numpy) ---
    rv = (radar > 0.0) & (radar < 100.0)
    radar_inv = np.where(rv, 1.0 / np.where(rv, radar, 1.0), 0.0)
    qv = (rcnet > 0.0) & (rcnet < 100.0)
    rc_inv = np.where(qv, 1.0 / np.where(qv, rcnet, 1.0), 0.0)

    ga = Optimizer(estimate=mono.copy(), target=radar_inv, valid=rv,
                   depth_type="inv")
    ga.optimize_scale()
    ga.apply_scale()
    ga.clamp_min_max(clamp_min=0.1, clamp_max=255.0)
    ref_int_depth = ga.output.astype(np.float32)

    ref_scales = np.ones_like(ref_int_depth)
    ref_scales[qv] = rc_inv[qv] / ref_int_depth[qv]
    ref_scales[rv] = radar_inv[rv] / ref_int_depth[rv]
    ref_scales = mutils.normalize_unit_range(ref_scales.astype(np.float32))

    # --- riders side (jitted ops) ---
    a = cfg.alignment
    r_inv, r_valid = alignment.validity_and_inverse(
        jnp.asarray(radar), a.min_depth, a.max_depth)
    int_depth = alignment.align_mono_prior(
        jnp.asarray(mono), r_inv, r_valid, mode=a.mode,
        mono_type=a.mono_type, bounds_inv=a.bounds_inv,
        bounds_pos=a.bounds_pos, iterations=a.iterations,
        min_pred=a.min_pred, max_pred=a.max_pred)
    q_inv, q_valid = alignment.validity_and_inverse(
        jnp.asarray(rcnet), a.min_depth, a.max_depth)
    scales = scale_map.synthesize_scale_map(
        int_depth, r_inv, r_valid, q_inv, q_valid)

    d_diff = np.abs(np.asarray(int_depth) - ref_int_depth).max()
    s_diff = np.abs(np.asarray(scales) - ref_scales).max()
    assert d_diff < 2e-3, f"int_depth max abs diff {d_diff}"
    assert s_diff < 2e-3, f"int_scales max abs diff {s_diff}"


@pytest.mark.slow
def test_end_to_end_metric_parity(reference_env, reference_model,
                                  mini_root):
    """All 7 validation metrics within 1% of the actual reference."""
    cfg = _mini_cfg(mini_root)
    scenes = ("scene-b",)

    ref = _run_reference_validation(reference_env, reference_model,
                                    mini_root, scenes)
    variables = _riders_variables(reference_model.state_dict())

    # converted tree must exactly match the flax template
    import jax
    import jax.numpy as jnp
    from riders_tpu.models import convert
    from riders_tpu.models.factory import build_sml_model
    model = build_sml_model(cfg)
    h, w = cfg.sml.net_shape
    template = jax.device_get(jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)),
        jnp.ones((1, h, w, 1))))
    problems = convert.check_tree_matches(variables["params"],
                                          template["params"])
    problems += convert.check_tree_matches(variables["batch_stats"],
                                           template["batch_stats"])
    assert not problems, problems[:10]

    riders = _run_riders_validation(cfg, variables, scenes)

    rel = {}
    for k in METRIC_KEYS:
        rel[k] = abs(riders[k] - ref[k]) / max(abs(ref[k]), 1e-12)
    _write_parity_md(ref, riders, rel)

    bad = {k: f"{rel[k]:.4%} (ref {ref[k]:.6f} vs riders {riders[k]:.6f})"
           for k in METRIC_KEYS if rel[k] > BUDGET}
    assert not bad, f"metrics beyond the 1% budget: {bad}"


@pytest.mark.slow
def test_dpt_end_to_end_metric_parity(reference_env, mini_root,
                                      monkeypatch):
    """Round-2 VERDICT weak #5(a): the full val protocol with the
    DPT-Large (ViT-L/16) scale-map learner in place of midas-small.

    The reference side runs val_zju.validate with a torch twin of
    DPTDepthModel at the REAL dpt-large dimensions (embed 1024, depth 24,
    heads 16, hooks 5/11/17/23, reassemble 256/512/1024/1024 - the
    vitl16_384 row of modules/midas/blocks_large.py) including the
    runtime pos-embed interpolation of backbones/vit.py:16-30; the riders
    side runs the jitted DPTScaleMapLearner with converted weights."""
    import torch

    import test_convert_dpt as tcd

    for k, v in dict(DIM=1024, HEADS=16, DEPTH=24, GRID=24,
                     REASSEMBLE=(256, 512, 1024, 1024), FEATURES=256,
                     HOOKS=(5, 11, 17, 23)).items():
        monkeypatch.setattr(tcd, k, v)

    torch.manual_seed(11)
    model = tcd.TDPT(beit=False)
    with torch.no_grad():
        for p in model.parameters():
            p.normal_(0, 0.02)
    model.eval()

    cfg = _mini_cfg(mini_root)
    cfg = cfg.replace(sml=dataclasses.replace(cfg.sml,
                                              model_type="dpt-large"))
    scenes = ("scene-b",)

    ref = _run_reference_validation(reference_env, model, mini_root,
                                    scenes)

    from riders_tpu.models import convert
    from riders_tpu.models.factory import build_sml_model
    rmodel = build_sml_model(cfg)
    sd = {k: np.asarray(v.detach().numpy())
          for k, v in model.state_dict().items()}
    variables = convert.convert_dpt_state_dict(sd, rmodel.config)

    riders = _run_riders_validation(cfg, variables, scenes)

    rel = {k: abs(riders[k] - ref[k]) / max(abs(ref[k]), 1e-12)
           for k in METRIC_KEYS}
    from parity_common import write_fragment
    write_fragment("dpt", {"ref": ref, "riders": riders, "rel": rel})

    bad = {k: f"{rel[k]:.4%} (ref {ref[k]:.6f} vs riders {riders[k]:.6f})"
           for k in METRIC_KEYS if rel[k] > BUDGET}
    assert not bad, f"metrics beyond the 1% budget: {bad}"


@pytest.mark.slow
def test_dpt_beit_end_to_end_metric_parity(reference_env, mini_root,
                                           monkeypatch):
    """Round-3 VERDICT next #2: the full val protocol with BEiT-L/16-512
    - the reference's DPT *default* backbone (dpt_depth.py:33,
    train_zju.py:189) - in place of midas-small.

    The torch twin runs at the REAL beitl16_512 dimensions (embed 1024,
    depth 24, heads 16, pretrained grid 32, hooks 5/11/17/23, reassemble
    256/512/1024/1024 - blocks_large.py:35-41) including the reference's
    runtime rel-pos-bias resize (backbones/beit.py:29-63): the mini net
    shape (64, 96) puts the runtime window at (4, 6), non-square and far
    from the pretrained 32x32, so the decomposed-bias interpolation is
    genuinely exercised on both sides."""
    import torch

    import test_convert_dpt as tcd

    for k, v in dict(DIM=1024, HEADS=16, DEPTH=24, GRID=32,
                     REASSEMBLE=(256, 512, 1024, 1024), FEATURES=256,
                     HOOKS=(5, 11, 17, 23)).items():
        monkeypatch.setattr(tcd, k, v)

    torch.manual_seed(13)
    model = tcd.TDPT(beit=True)
    with torch.no_grad():
        for p in model.parameters():
            p.normal_(0, 0.02)
    model.eval()

    cfg = _mini_cfg(mini_root)
    cfg = cfg.replace(sml=dataclasses.replace(cfg.sml,
                                              model_type="dpt-beit-large"))
    scenes = ("scene-b",)

    ref = _run_reference_validation(reference_env, model, mini_root,
                                    scenes)

    from riders_tpu.models import convert
    from riders_tpu.models.factory import build_sml_model
    rmodel = build_sml_model(cfg)
    assert rmodel.config.pretrained_grid == 32  # beitl16_512 row
    sd = {k: np.asarray(v.detach().numpy())
          for k, v in model.state_dict().items()}
    variables = convert.convert_dpt_state_dict(sd, rmodel.config)

    riders = _run_riders_validation(cfg, variables, scenes)

    rel = {k: abs(riders[k] - ref[k]) / max(abs(ref[k]), 1e-12)
           for k in METRIC_KEYS}
    from parity_common import write_fragment
    write_fragment("beit", {"ref": ref, "riders": riders, "rel": rel})

    bad = {k: f"{rel[k]:.4%} (ref {ref[k]:.6f} vs riders {riders[k]:.6f})"
           for k in METRIC_KEYS if rel[k] > BUDGET}
    assert not bad, f"metrics beyond the 1% budget: {bad}"


# ---------------------------------------------------------------------------
# Stage-2 parity: the reference's own RC-Net (networks.py / rcnet_model.py /
# rcnet_main.forward_output) vs the riders_tpu jitted stage-2 pipeline with
# converted weights.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def rcnet_env(reference_env):
    """Import the reference RCNet stack (flat imports need the RCNet dir
    on sys.path; `reference_env` already installed the torchvision stub
    with roi_pool/pad)."""
    rc_dir = os.path.join(REFERENCE, "RCNet")
    if rc_dir not in sys.path:
        sys.path.insert(0, rc_dir)
    import rcnet_main
    return rcnet_main


def _build_reference_rcnet(cfg, seed=3, train=False):
    """The reference's own RCNetModel at the mini geometry, with perturbed
    BN statistics so folding/stat semantics are exercised."""
    import torch
    import torch.nn as nn

    from rcnet_model import RCNetModel

    rc = cfg.rcnet
    torch.manual_seed(seed)
    ref = RCNetModel(
        input_channels_image=3, input_channels_depth=3,
        input_patch_size_image=list(rc.patch_size),
        encoder_type=["rcnet", "batch_norm"],
        n_filters_encoder_image=list(rc.n_filters_encoder_image),
        n_neurons_encoder_depth=list(rc.n_neurons_encoder_depth),
        decoder_type=["multiscale", "batch_norm"],
        n_filters_decoder=list(rc.n_filters_decoder),
        weight_initializer="kaiming_uniform",
        activation_func="leaky_relu", device=torch.device("cpu"))
    for module in (ref.encoder, ref.decoder):
        module.train(train)
        with torch.no_grad():
            for m in module.modules():
                if isinstance(m, nn.BatchNorm2d):
                    m.running_mean.normal_(0, 0.1)
                    m.running_var.uniform_(0.5, 2.0)
                    m.weight.normal_(1.0, 0.1)
                    m.bias.normal_(0, 0.1)
    return ref


def _rcnet_state_dict(ref):
    sd = {}
    for prefix, module in (("encoder.", ref.encoder),
                           ("decoder.", ref.decoder)):
        for k, v in module.state_dict().items():
            sd[prefix + k] = np.asarray(v.detach().numpy())
    return sd


def test_rcnet_train_step_parity(rcnet_env, mini_root):
    """Round-2 VERDICT weak #5(b): the TRAINING-step semantics - label
    synthesis (rcnet_main.py:304-332), train-mode BN forward, and the
    positive-class-weighted masked BCE (rcnet_model.py:125-166) - must
    produce the same loss and the same gradients as the reference on one
    batch with identical converted weights."""
    import torch

    import jax
    import jax.numpy as jnp

    from riders_tpu.models import convert
    from riders_tpu.models.rcnet import RCNet
    from riders_tpu.ops.losses import weighted_bce_with_logits
    from riders_tpu.pipelines.rcnet_training import synthesize_labels

    cfg = _mini_cfg(mini_root)
    rc, t = cfg.rcnet, cfg.rcnet_train
    ph, pw = rc.patch_size
    pad_y, pad_x = ph // 2, pw // 2
    H, W = cfg.dataset.image_shape
    Hp, Wp = H + ph, W + pw
    B, K = 2, 3

    ref = _build_reference_rcnet(cfg, seed=7, train=True)

    rng = np.random.default_rng(23)
    image = rng.random((B, Hp, Wp, 3)).astype(np.float32)
    # Points in padded coordinates, boxes fully inside the padded frame.
    pts = np.stack([
        rng.integers(pad_x, W + pad_x, (B, K)),
        rng.integers(pad_y, H + pad_y, (B, K)),
        rng.random((B, K)) * 40 + 3], axis=2).astype(np.float32)
    boxes = np.stack([pts[..., 0] - pad_x, pts[..., 1] - pad_y,
                      pts[..., 0] + pad_x, pts[..., 1] + pad_y],
                     axis=2).astype(np.float32)
    # GT depth crops: mostly valid, some holes, values straddling the
    # correspondence distance around each point's depth.
    gt = (pts[..., 2][:, :, None, None]
          + rng.normal(0, 1.0, (B, K, ph, pw))).astype(np.float32)
    gt[rng.random((B, K, ph, pw)) < 0.25] = 0.0

    # ---- reference: rcnet_main.py:282-350 verbatim semantics ----
    im_t = torch.from_numpy(image).permute(0, 3, 1, 2)
    pts_t = torch.from_numpy(pts.reshape(B * K, 3))
    boxes_t = [torch.from_numpy(boxes[b]) for b in range(B)]
    gt_t = torch.from_numpy(gt.reshape(B * K, 1, ph, pw))
    z = pts_t[..., 2].view(B * K, 1, 1, 1)
    dist = torch.abs(gt_t - z * torch.ones_like(gt_t))
    label_t = torch.where(dist < t.max_distance_correspondence,
                          torch.ones_like(gt_t), torch.zeros_like(gt_t))
    label_t = torch.where(gt_t > 0, label_t, torch.zeros_like(label_t))
    validity_t = torch.where(gt_t <= 0, torch.zeros_like(gt_t),
                             torch.ones_like(gt_t))

    logits_t = ref.forward(im_t, pts_t, boxes_t, return_logits=True)
    ref_loss, _ = ref.compute_loss(
        logits=logits_t, ground_truth=label_t.float(),
        validity_map=validity_t, w_positive_class=t.w_positive_class)
    ref_loss.backward()
    ref_grads = {}
    for prefix, module in (("encoder.", ref.encoder),
                           ("decoder.", ref.decoder)):
        for k, v in module.named_parameters():
            # Unreached params (e.g. the decoder's unused extra-resolution
            # output convs) get no grad in torch; their riders twin must
            # then also have a zero gradient.
            ref_grads[prefix + k] = (
                np.zeros(v.shape, np.float32) if v.grad is None
                else np.asarray(v.grad.detach().numpy()))

    # ---- riders: the train-step loss_fn with converted weights ----
    sd = _rcnet_state_dict(ref)
    variables = convert.convert_rcnet_state_dict(sd)
    model = RCNet(config=rc)
    batch = {
        "image": jnp.asarray(image), "points": jnp.asarray(pts),
        "boxes": jnp.asarray(boxes),
        "gt_crops": jnp.asarray(gt)[..., None],
        "point_mask": jnp.ones((B, K), np.float32),
    }

    def loss_fn(params):
        logits = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch["image"], batch["points"], batch["boxes"],
            batch["point_mask"], train=True, return_logits=True,
            mutable=["batch_stats"])[0]
        labels, validity = synthesize_labels(
            batch["gt_crops"], batch["points"][..., 2],
            t.max_distance_correspondence,
            t.set_invalid_to_negative_class)
        return weighted_bce_with_logits(logits, labels, validity,
                                        t.w_positive_class)

    # XLA's CPU convolutions go through a reduced-precision oneDNN path
    # (~1e-3 relative); force full fp32 accumulation for the comparison.
    with jax.default_matmul_precision("highest"):
        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(
            variables["params"])
    np.testing.assert_allclose(float(loss), float(ref_loss.detach()),
                               rtol=1e-5)

    # Map the torch grads through the SAME converter (its kernel
    # transposes/reshapes are linear, so they transform gradients too);
    # running stats carry no grads - feed zeros to satisfy the key map.
    grad_sd = {k: ref_grads.get(k, np.zeros_like(v))
               for k, v in sd.items()}
    ref_grad_tree = convert.convert_rcnet_state_dict(grad_sd)["params"]

    flat_ours = jax.tree_util.tree_leaves_with_path(grads)
    flat_ref = dict(jax.tree_util.tree_leaves_with_path(ref_grad_tree))
    assert len(flat_ours) == len(flat_ref)
    gmax = max(float(np.abs(np.asarray(r)).max())
               for r in flat_ref.values())
    worst_cos, worst_rel, n_compared = 1.0, 0.0, 0
    for path, g in flat_ours:
        r = np.asarray(flat_ref[path], np.float64).ravel()
        g = np.asarray(g, np.float64).ravel()
        rn, gn = np.linalg.norm(r), np.linalg.norm(g)
        if rn < 1e-6 * gmax:
            # eps-suppressed leaves: the encoder's attention runs on
            # single-token streams (L=S=1), where linear attention's
            # normalization cancels the q/k contribution up to its 1e-6
            # eps - the true q/k-projection gradients are numerical
            # noise.  Require ours to be equally negligible.
            assert gn < 1e-5 * gmax, (path, rn, gn, gmax)
            continue
        cos = float(np.dot(r, g) / (rn * gn))
        rel = float(np.linalg.norm(r - g) / rn)
        assert cos > 0.9999, (path, cos)
        assert rel < 5e-3, (path, rel)
        worst_cos, worst_rel = min(worst_cos, cos), max(worst_rel, rel)
        n_compared += 1

    from parity_common import write_fragment
    write_fragment("rcnet_train", {
        "ref_loss": float(ref_loss.detach()),
        "riders_loss": float(loss),
        "rel_loss": abs(float(loss) - float(ref_loss.detach()))
        / abs(float(ref_loss.detach())),
        "n_leaves": len(flat_ours), "n_compared": n_compared,
        "worst_cos": worst_cos, "worst_rel": worst_rel})


def test_rcnet_stage2_parity(rcnet_env, mini_root):
    """forward_output (rcnet_main.py:435-487) on the reference's own
    networks vs the riders jitted inference - same random weights via
    convert_rcnet_state_dict, same frame/points - must produce the same
    quasi-dense depth and response maps."""
    import torch

    import jax

    from riders_tpu.models import convert
    from riders_tpu.models.rcnet import RCNet
    from riders_tpu.pipelines.rcnet_inference import (
        make_rcnet_infer_fn,
        pad_image_for_patches,
    )

    cfg = _mini_cfg(mini_root)
    rc = cfg.rcnet
    device = torch.device("cpu")
    ref = _build_reference_rcnet(cfg, seed=3, train=False)

    H, W = cfg.dataset.image_shape
    ph, pw = rc.patch_size
    pad_y, pad_x = ph // 2, pw // 2
    rng = np.random.default_rng(11)
    image = rng.random((H, W, 3)).astype(np.float32)
    K = 4
    pts = np.stack([
        rng.integers(4, W - 4, K),
        rng.integers(4, H - 4, K),
        rng.random(K) * 40 + 3], axis=1).astype(np.float32)
    thr = 0.4

    # ---- reference: pad + shift on the host, forward_output ----
    im_t = torch.from_numpy(image).permute(2, 0, 1)[None]
    pts_ref = pts.copy()
    pts_ref[:, 0] += pad_x
    pts_ref[:, 1] += pad_y
    pts_t = torch.from_numpy(pts_ref)
    boxes_t = torch.stack([
        pts_t[:, 0] - pad_x, pts_t[:, 1] - pad_y,
        pts_t[:, 0] + pad_x, pts_t[:, 1] + pad_y], dim=1)
    with torch.no_grad():
        ref_depth, ref_resp = rcnet_env.forward_output(
            ref, im_t, pts_t, [boxes_t], response_thr=thr, device=device)
    ref_depth = ref_depth[0].numpy()
    ref_resp = ref_resp[0].numpy()

    # ---- riders: converted weights through the jitted pipeline ----
    variables = convert.convert_rcnet_state_dict(_rcnet_state_dict(ref))

    model = RCNet(config=dataclasses.replace(rc, response_threshold=thr))
    batch = {
        "image": np.asarray(pad_image_for_patches(image, rc.patch_size))[
            None],
        "points": pts[None],
        "point_mask": np.ones((1, K), np.float32),
    }
    mcfg = cfg.replace(rcnet=dataclasses.replace(rc,
                                                 response_threshold=thr))
    out = jax.device_get(
        make_rcnet_infer_fn(mcfg, model)(variables, batch))
    got_depth = np.asarray(out["depth"][0])
    got_resp = np.asarray(out["response"][0])
    assert float(out["threshold"][0]) == pytest.approx(thr)

    assert ref_depth.shape == got_depth.shape == (H, W)
    # identical nonzero support and matching values (fp32 network in both
    # frameworks; the composition is a max + weighted average)
    np.testing.assert_array_equal(ref_depth > 0, got_depth > 0)
    np.testing.assert_allclose(got_resp, ref_resp, rtol=1e-4, atol=1e-4)
    m = ref_depth > 0
    assert m.sum() > 0, "test frame produced an empty quasi-dense map"
    np.testing.assert_allclose(got_depth[m], ref_depth[m], rtol=1e-4,
                               atol=1e-3)


def test_multires_decoder_parity(rcnet_env):
    """Round-2 VERDICT missing #3: the n_resolution>1 decoder form
    (networks.py:678-778: per-scale linear output convs, bilinear
    align_corners x2 upsamples concatenated after the next encoder skip,
    deconv0 fed by the upsampled 1/2-scale output) - the reference's own
    networks.MultiScaleDecoder vs the riders decoder with converted
    weights must agree on ALL four output scales."""
    import torch
    import torch.nn as nn

    import jax.numpy as jnp

    from networks import MultiScaleDecoder as TorchMSD

    from riders_tpu.models import convert
    from riders_tpu.models.rcnet import MultiScaleDecoder

    n_filters = [32, 16, 16, 8, 8]
    n_skips = [16, 8, 8, 4, 0]
    torch.manual_seed(5)
    tdec = TorchMSD(
        input_channels=24, output_channels=1, n_resolution=4,
        n_filters=n_filters, n_skips=n_skips,
        weight_initializer="kaiming_uniform",
        activation_func="leaky_relu", output_func="linear",
        use_batch_norm=True, deconv_type="up")
    tdec.eval()
    with torch.no_grad():
        for m in tdec.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.normal_(1.0, 0.1)
                m.bias.normal_(0, 0.1)

    rng = np.random.default_rng(31)
    x = rng.standard_normal((2, 2, 2, 24)).astype(np.float32)
    # shallow->deep skips; channels per n_skips[d] for deconv d.
    skips = [rng.standard_normal((2, 32, 32, 4)).astype(np.float32),
             rng.standard_normal((2, 16, 16, 8)).astype(np.float32),
             rng.standard_normal((2, 8, 8, 8)).astype(np.float32),
             rng.standard_normal((2, 4, 4, 16)).astype(np.float32)]

    def t(a):  # NHWC -> NCHW tensor
        return torch.from_numpy(np.transpose(a, (0, 3, 1, 2)).copy())

    with torch.no_grad():
        ref_outs = tdec(t(x), [t(s) for s in skips], shape=(64, 64))
    assert len(ref_outs) == 4

    sd = {"decoder." + k: np.asarray(v.detach().numpy())
          for k, v in tdec.state_dict().items()}
    dec_p, dec_s = convert.convert_rcnet_decoder_state_dict(sd)

    dec = MultiScaleDecoder(
        n_filters=tuple(n_filters), output_shape=(64, 64),
        output_channels=1, activation="leaky_relu", use_batch_norm=True,
        n_resolution=4, phase_tail=False)
    outs = dec.apply({"params": dec_p, "batch_stats": dec_s},
                     jnp.asarray(x), [jnp.asarray(s) for s in skips])
    assert len(outs) == 4
    for got, ref in zip(outs, ref_outs):
        np.testing.assert_allclose(
            np.transpose(np.asarray(got), (0, 3, 1, 2)),
            ref.numpy(), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("depth,n_resolution,output_func", [
    (6, 1, "linear"),            # deconv5 present (networks.py:538-560)
    (7, 3, "sigmoid"),           # deconv6+deconv5; sigmoid output convs
    (5, 1, "linear_upsample"),   # output0 = bilinear x2 of output1
                                 # (networks.py:508-510, :761-763)
])
def test_decoder_depth_and_output_func_parity(rcnet_env, depth,
                                              n_resolution, output_func):
    """Round-3 VERDICT missing #3: generic decoder knobs - network_depth
    6/7 (networks.py:518-560) and output_func sigmoid / upsample
    (networks.py:505-510, :761-767) - vs the reference's own
    networks.MultiScaleDecoder with converted weights."""
    import torch
    import torch.nn as nn

    import jax.numpy as jnp

    from networks import MultiScaleDecoder as TorchMSD

    from riders_tpu.models import convert
    from riders_tpu.models.rcnet import MultiScaleDecoder

    n_filters = [16, 16, 16, 8, 8, 8, 8][:depth]
    # n_skips deep->shallow per reference block order; last entry 0
    # (deconv0 has no encoder skip at this pyramid size).
    n_skips = [16, 8, 8, 4, 4, 4, 4][:depth - 1] + [0]
    torch.manual_seed(7)
    tdec = TorchMSD(
        input_channels=24, output_channels=1, n_resolution=n_resolution,
        n_filters=n_filters, n_skips=n_skips,
        weight_initializer="kaiming_uniform",
        activation_func="leaky_relu", output_func=output_func,
        use_batch_norm=True, deconv_type="up")
    tdec.eval()
    with torch.no_grad():
        for m in tdec.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.normal_(1.0, 0.1)
                m.bias.normal_(0, 0.1)

    rng = np.random.default_rng(41)
    x = rng.standard_normal((2, 2, 2, 24)).astype(np.float32)
    # shallow->deep skips, channel c = n_skips[depth-2-i], doubling sizes.
    skips = []
    for i in range(depth - 1):
        hw = 2 ** (depth - 1 - i)
        skips.append(rng.standard_normal(
            (2, hw, hw, n_skips[depth - 2 - i])).astype(np.float32))
    out_hw = 2 ** depth

    def t(a):  # NHWC -> NCHW tensor
        return torch.from_numpy(np.transpose(a, (0, 3, 1, 2)).copy())

    with torch.no_grad():
        ref_outs = tdec(t(x), [t(s) for s in skips],
                        shape=(out_hw, out_hw))

    sd = {"decoder." + k: np.asarray(v.detach().numpy())
          for k, v in tdec.state_dict().items()}
    dec_p, dec_s = convert.convert_rcnet_decoder_state_dict(sd)

    dec = MultiScaleDecoder(
        n_filters=tuple(n_filters), output_shape=(out_hw, out_hw),
        output_channels=1, activation="leaky_relu", use_batch_norm=True,
        n_resolution=n_resolution, output_func=output_func,
        phase_tail=False)
    outs = dec.apply({"params": dec_p, "batch_stats": dec_s},
                     jnp.asarray(x), [jnp.asarray(s) for s in skips])
    if not isinstance(outs, (list, tuple)):
        outs = [outs]
    assert len(outs) == len(ref_outs)
    for got, ref in zip(outs, ref_outs):
        np.testing.assert_allclose(
            np.transpose(np.asarray(got), (0, 3, 1, 2)),
            ref.numpy(), rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------
# Hierarchical-backbone end-to-end val parity (round-5 VERDICT next #5):
# SwinV2-L (shifted-window masks) and LeViT-384 (BN folding + bias
# tables at the real 14x14 grid) through the FULL validation protocol.
# ---------------------------------------------------------------------


@pytest.fixture(scope="module")
def square_mini_root(tmp_path_factory):
    """128x128 mini-scenes: swin2's stage grids must stay divisible by
    the (clamped) window at every stage, which needs a square net."""
    from test_drivers import make_mini_dataset
    root = str(tmp_path_factory.mktemp("parity_square"))
    make_mini_dataset(root, ["scene-b"], H=128, W=128)
    return root


def _hier_dpt_twin(backbone, chans, features, nhwc_taps):
    """Standard 4-level DPT assembly (dpt_depth.py:104-110,169-177)
    around a hierarchical backbone whose forward returns 4 feature maps;
    checkpoint key layout matches the reference's pretrained.model/
    scratch naming so convert_dpt_state_dict consumes state_dict() as-is."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    from test_convert_dpt import TFusion

    class TDPTHier(nn.Module):
        def __init__(self):
            super().__init__()
            pre = nn.Module()
            pre.model = backbone
            self.pretrained = pre
            f = features
            scratch = nn.Module()
            for i, c in enumerate(chans):
                setattr(scratch, f"layer{i + 1}_rn",
                        nn.Conv2d(c, f, 3, 1, 1, bias=False))
            scratch.refinenet4 = TFusion(f, has_skip=False)
            scratch.refinenet3 = TFusion(f, has_skip=True)
            scratch.refinenet2 = TFusion(f, has_skip=True)
            scratch.refinenet1 = TFusion(f, has_skip=True)
            scratch.output_conv = nn.Sequential(
                nn.Conv2d(f, f // 2, 3, 1, 1),
                nn.Upsample(scale_factor=2, mode="bilinear",
                            align_corners=True),
                nn.Conv2d(f // 2, 32, 3, 1, 1),
                nn.ReLU(True),
                nn.Conv2d(32, 1, 1),
                nn.ReLU(True))
            self.scratch = scratch

        def forward(self, x, d):
            taps = self.pretrained.model(x)
            if nhwc_taps:
                taps = [t.permute(0, 3, 1, 2) for t in taps]
            r = [getattr(self.scratch, f"layer{n + 1}_rn")(t)
                 for n, t in enumerate(taps)]
            p4 = self.scratch.refinenet4(r[3], size=r[2].shape[2:])
            p3 = self.scratch.refinenet3(p4, r[2], size=r[1].shape[2:])
            p2 = self.scratch.refinenet2(p3, r[1], size=r[0].shape[2:])
            p1 = self.scratch.refinenet1(p2, r[0])
            out = self.scratch.output_conv(p1)
            scales = F.relu(1.0 + out)
            pred = d * scales
            pred = torch.clamp(pred, max=1.0 / 0.1)
            pred = torch.clamp(pred, min=1.0 / 255.0)
            return pred

    return TDPTHier()


def _square_cfg(root, model_type, net):
    cfg = _mini_cfg(root)
    return cfg.replace(
        dataset=dataclasses.replace(cfg.dataset, image_shape=(128, 128)),
        sml=dataclasses.replace(cfg.sml, model_type=model_type,
                                net_shape=net))


@pytest.mark.slow
def test_dpt_swin2_end_to_end_metric_parity(reference_env,
                                            square_mini_root,
                                            monkeypatch):
    """Round-5 VERDICT next #5(a): the full val protocol with SwinV2-L
    (swin2l24_384) at the REAL dimensions - embed 192, depths (2,2,18,2),
    heads (6,12,24,48), window 24, pretrained windows (12,12,12,6)
    (blocks_large.py swin2l24_384 row via timm).  Net 192x192 puts stage
    1's grid at 48x48 > window 24, so the shifted-window attention masks
    - the highest-risk unproven machinery per the round-4 verdict - run
    on both sides; deeper stages exercise the window clamp."""
    import torch

    import test_convert_swin2 as tcs

    for k, v in dict(EMBED=192, DEPTHS=(2, 2, 18, 2),
                     HEADS=(6, 12, 24, 48), WINDOW=24,
                     PRETRAINED=(12, 12, 12, 6), IMG=192).items():
        monkeypatch.setattr(tcs, k, v)

    torch.manual_seed(17)
    backbone = tcs.TSwin2()
    model = _hier_dpt_twin(backbone, (192, 384, 768, 1536), 256,
                           nhwc_taps=True)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "logit_scale" not in name:
                p.normal_(0, 0.02)
    model.eval()

    cfg = _square_cfg(square_mini_root, "dpt-swin2-large", (192, 192))
    scenes = ("scene-b",)

    ref = _run_reference_validation(reference_env, model,
                                    square_mini_root, scenes,
                                    net=(192, 192))

    from riders_tpu.models import convert
    from riders_tpu.models.factory import build_sml_model
    rmodel = build_sml_model(cfg)
    assert rmodel.config.backbone == "swin2"
    sd = {k: np.asarray(v.detach().numpy())
          for k, v in model.state_dict().items()
          if "table" not in k and "rel_index" not in k
          and ".mask" not in k}
    variables = convert.convert_dpt_state_dict(sd, rmodel.config)

    riders = _run_riders_validation(cfg, variables, scenes)

    rel = {k: abs(riders[k] - ref[k]) / max(abs(ref[k]), 1e-12)
           for k in METRIC_KEYS}
    from parity_common import write_fragment
    write_fragment("swin2", {"ref": ref, "riders": riders, "rel": rel})

    bad = {k: f"{rel[k]:.4%} (ref {ref[k]:.6f} vs riders {riders[k]:.6f})"
           for k in METRIC_KEYS if rel[k] > BUDGET}
    assert not bad, f"metrics beyond the 1% budget: {bad}"


@pytest.mark.slow
def test_dpt_levit_end_to_end_metric_parity(reference_env,
                                            square_mini_root,
                                            monkeypatch):
    """Round-5 VERDICT next #5(b): the full val protocol with LeViT-384
    at the REAL dimensions - embed (384,512,768), depths (4,4,4), heads
    (6,9,12), key_dim 32 - at the dpt_levit_224 protocol resolution
    (224x224, stem grid 14x14 = the pretrained attention-bias tables),
    exercising BN folding of every LinearNorm/ConvNorm/ConvTransposeNorm
    pair, the 3-hook decode, the narrow 64/8 head and the hard-swish
    transpose stem end to end."""
    import torch

    import test_convert_levit as tcl

    for k, v in dict(EMBED=(384, 512, 768), KEY_DIM=32,
                     HEADS=(6, 9, 12), DEPTHS=(4, 4, 4), ATTN_RATIO=2,
                     DOWN_RATIO=4, HOOKS=(3, 11, 21), FEATURES=256,
                     HF2=8, IMG=224).items():
        monkeypatch.setattr(tcl, k, v)

    torch.manual_seed(19)
    model = tcl.TDPTLevit()
    with torch.no_grad():
        for p in model.parameters():
            p.normal_(0, 0.02)
        for m in model.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 2.0)
    model.eval()

    cfg = _square_cfg(square_mini_root, "dpt-levit-224", (224, 224))
    scenes = ("scene-b",)

    ref = _run_reference_validation(reference_env, model,
                                    square_mini_root, scenes,
                                    net=(224, 224))

    from riders_tpu.models import convert
    from riders_tpu.models.factory import build_sml_model
    rmodel = build_sml_model(cfg)
    assert rmodel.config.backbone == "levit"
    assert rmodel.config.head_features_1 == 64
    assert rmodel.config.head_features_2 == 8
    sd = {k: np.asarray(v.detach().numpy())
          for k, v in model.state_dict().items() if "bias_idx" not in k}
    variables = convert.convert_levit_state_dict(sd, rmodel.config)

    riders = _run_riders_validation(cfg, variables, scenes)

    rel = {k: abs(riders[k] - ref[k]) / max(abs(ref[k]), 1e-12)
           for k in METRIC_KEYS}
    from parity_common import write_fragment
    write_fragment("levit", {"ref": ref, "riders": riders, "rel": rel})

    bad = {k: f"{rel[k]:.4%} (ref {ref[k]:.6f} vs riders {riders[k]:.6f})"
           for k in METRIC_KEYS if rel[k] > BUDGET}
    assert not bad, f"metrics beyond the 1% budget: {bad}"


@pytest.mark.slow
def test_dpt_hybrid_end_to_end_metric_parity(reference_env,
                                             square_mini_root,
                                             monkeypatch):
    """Round-5 stretch: the full val protocol with dpt_hybrid
    (vitb_rn50_384) at the REAL dimensions - truncated non-preact
    ResNetV2-50 (TF-SAME StdConv + GroupNorm, stages 3/4/9) feeding
    ViT-B/16 blocks, raw resnet taps at /4 and /8, readout reassembly at
    /16 and /32, and the runtime pos-embed interpolation (24x24 -> the
    12x12 net-192 grid) on both sides."""
    from test_convert_hybrid import build_hybrid_twin

    model = build_hybrid_twin(monkeypatch)

    cfg = _square_cfg(square_mini_root, "dpt-hybrid", (192, 192))
    scenes = ("scene-b",)

    ref = _run_reference_validation(reference_env, model,
                                    square_mini_root, scenes,
                                    net=(192, 192))

    from riders_tpu.models import convert
    from riders_tpu.models.factory import build_sml_model
    rmodel = build_sml_model(cfg)
    assert rmodel.config.backbone == "vit_hybrid"
    sd = {k: np.asarray(v.detach().numpy())
          for k, v in model.state_dict().items()}
    variables = convert.convert_dpt_state_dict(sd, rmodel.config)

    riders = _run_riders_validation(cfg, variables, scenes)

    rel = {k: abs(riders[k] - ref[k]) / max(abs(ref[k]), 1e-12)
           for k in METRIC_KEYS}
    from parity_common import write_fragment
    write_fragment("hybrid", {"ref": ref, "riders": riders, "rel": rel})

    bad = {k: f"{rel[k]:.4%} (ref {ref[k]:.6f} vs riders {riders[k]:.6f})"
           for k in METRIC_KEYS if rel[k] > BUDGET}
    assert not bad, f"metrics beyond the 1% budget: {bad}"
