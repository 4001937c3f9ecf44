"""Shared PARITY.md assembly: parity tests dump JSON fragments and any of
them re-renders the document, so sections survive partial reruns.

`.parity_fragments/*.json` is deliberately TRACKED in git: the fragments
are PARITY.md's data source (raw metric values from the last full parity
run), and keeping them lets a partial rerun of one test re-render the
whole document without losing the other sections."""

import json
import os

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FRAG_DIR = os.path.join(REPO_ROOT, ".parity_fragments")

METRIC_KEYS = ("mae", "rmse", "imae", "irmse", "abs_rel", "sq_rel",
               "delta1")
BUDGET = 0.01


def write_fragment(name: str, payload: dict) -> None:
    os.makedirs(FRAG_DIR, exist_ok=True)
    with open(os.path.join(FRAG_DIR, name + ".json"), "w") as f:
        json.dump(payload, f, indent=1)
    assemble_parity_md()


def _load(name):
    path = os.path.join(FRAG_DIR, name + ".json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return None


def assemble_parity_md() -> None:
    main = _load("main")
    interp = _load("interp")
    rcnet_train = _load("rcnet_train")
    dpt = _load("dpt")
    beit = _load("beit")
    swin2 = _load("swin2")
    levit = _load("levit")
    hybrid = _load("hybrid")

    lines = [
        "# PARITY - riders_tpu vs PyTorch reference",
        "",
        "End-to-end validation parity on the synthetic mini-scenes "
        "(tests/test_reference_parity.py).  Both sides run their FULL "
        "validation protocol - the reference's val_zju.validate "
        "(its own Optimizer/transforms/model/eval_utils, with a local "
        "fp32-exact efficientnet-lite3 twin standing in for the "
        "torch.hub download) and the riders_tpu fused jitted pipeline - "
        "with identical converted weights.",
        "",
    ]
    if main:
        ref, riders, rel = main["ref"], main["riders"], main["rel"]
        lines += [
            "| metric | reference | riders_tpu | rel. deviation | budget |",
            "|---|---|---|---|---|",
        ]
        for k in METRIC_KEYS:
            lines.append(f"| {k} | {ref[k]:.6f} | {riders[k]:.6f} | "
                         f"{rel[k] * 100:.4f}% | 1% |")
        lines += [
            "",
            f"All 7 metrics within the 1% budget: "
            f"**{all(rel[k] <= BUDGET for k in METRIC_KEYS)}**.",
            "",
        ]
    lines += [
        "Stage-1 intermediates (full-res, one frame): see "
        "test_stage1_intermediate_parity - max|int_depth diff| and "
        "max|int_scales diff| asserted < 2e-3.",
        "",
        "Stage-2 (RC-Net quasi-dense generation): see "
        "test_rcnet_stage2_parity - the reference's own "
        "rcnet_main.forward_output (networks.py RCNetEncoder/decoder, "
        "torchvision-exact roi_pool) vs the riders jitted stage-2 "
        "pipeline with converted weights agrees on the nonzero support "
        "exactly and on depth/response values at rtol 1e-4.",
        "",
    ]
    if dpt:
        ref, riders, rel = dpt["ref"], dpt["riders"], dpt["rel"]
        lines += [
            "## DPT-Large (ViT-L/16) SML: end-to-end val parity",
            "",
            "Same protocol as above with the DPT-Large scale-map learner "
            "in place of midas-small - the reference side runs its own "
            "DPTDepthModel forward (modules/midas/dpt_depth.py) via a "
            "from-scratch torch twin of the ViT-L backbone, the riders "
            "side the jitted DPTScaleMapLearner with converted weights "
            "(tests/test_reference_parity.py::"
            "test_dpt_end_to_end_metric_parity):",
            "",
            "| metric | reference | riders_tpu | rel. deviation | budget |",
            "|---|---|---|---|---|",
        ]
        for k in METRIC_KEYS:
            lines.append(f"| {k} | {ref[k]:.6f} | {riders[k]:.6f} | "
                         f"{rel[k] * 100:.4f}% | 1% |")
        lines.append("")
    if beit:
        ref, riders, rel = beit["ref"], beit["riders"], beit["rel"]
        lines += [
            "## BEiT-L/16-512 SML: end-to-end val parity",
            "",
            "Same protocol with the reference's DPT *default* backbone "
            "(dpt_depth.py:33, train_zju.py:189 use beitl16_512) at the "
            "real dimensions - embed 1024, depth 24, heads 16, pretrained "
            "grid 32 - including the runtime rel-pos-bias resize "
            "(backbones/beit.py:29-63) to the non-square (4, 6) mini "
            "window on both sides "
            "(tests/test_reference_parity.py::"
            "test_dpt_beit_end_to_end_metric_parity):",
            "",
            "| metric | reference | riders_tpu | rel. deviation | budget |",
            "|---|---|---|---|---|",
        ]
        for k in METRIC_KEYS:
            lines.append(f"| {k} | {ref[k]:.6f} | {riders[k]:.6f} | "
                         f"{rel[k] * 100:.4f}% | 1% |")
        lines.append("")
    if swin2:
        ref, riders, rel = swin2["ref"], swin2["riders"], swin2["rel"]
        lines += [
            "## SwinV2-L/24-384 SML: end-to-end val parity",
            "",
            "Same protocol with the swin2l24_384 backbone at the real "
            "dimensions - embed 192, depths (2,2,18,2), heads "
            "(6,12,24,48), window 24, pretrained windows (12,12,12,6) - "
            "on square 128x128 mini-scenes at net 192x192, so stage 1's "
            "48x48 grid genuinely exercises SHIFTED 24-windows with "
            "attention masks, and the deeper stages the window-clamp "
            "path (tests/test_reference_parity.py::"
            "test_dpt_swin2_end_to_end_metric_parity):",
            "",
            "| metric | reference | riders_tpu | rel. deviation | budget |",
            "|---|---|---|---|---|",
        ]
        for k in METRIC_KEYS:
            lines.append(f"| {k} | {ref[k]:.6f} | {riders[k]:.6f} | "
                         f"{rel[k] * 100:.4f}% | 1% |")
        lines.append("")
    if levit:
        ref, riders, rel = levit["ref"], levit["riders"], levit["rel"]
        lines += [
            "## LeViT-384 (dpt_levit_224) SML: end-to-end val parity",
            "",
            "Same protocol with the levit_384 backbone at the real "
            "dimensions - embed (384,512,768), depths (4,4,4), heads "
            "(6,9,12), key_dim 32 - at the protocol resolution 224x224 "
            "(grid 14x14 = the pretrained attention-bias tables), "
            "including BN-folding of every Linear/Conv/ConvTranspose "
            "Norm pair and the narrow 64/8 head + hard-swish transpose "
            "stem (tests/test_reference_parity.py::"
            "test_dpt_levit_end_to_end_metric_parity):",
            "",
            "| metric | reference | riders_tpu | rel. deviation | budget |",
            "|---|---|---|---|---|",
        ]
        for k in METRIC_KEYS:
            lines.append(f"| {k} | {ref[k]:.6f} | {riders[k]:.6f} | "
                         f"{rel[k] * 100:.4f}% | 1% |")
        lines.append("")
    if hybrid:
        ref, riders, rel = hybrid["ref"], hybrid["riders"], hybrid["rel"]
        lines += [
            "## dpt_hybrid (vitb_rn50_384) SML: end-to-end val parity",
            "",
            "Same protocol with the hybrid backbone at the real "
            "dimensions - truncated non-preact ResNetV2-50 (TF-SAME "
            "StdConv + GroupNorm, stages 3/4/9) feeding ViT-B/16, raw "
            "resnet taps at /4 and /8, readout reassembly at /16 and "
            "/32, runtime pos-embed interpolation 24x24 -> 12x12 "
            "(tests/test_reference_parity.py::"
            "test_dpt_hybrid_end_to_end_metric_parity):",
            "",
            "| metric | reference | riders_tpu | rel. deviation | budget |",
            "|---|---|---|---|---|",
        ]
        for k in METRIC_KEYS:
            lines.append(f"| {k} | {ref[k]:.6f} | {riders[k]:.6f} | "
                         f"{rel[k] * 100:.4f}% | 1% |")
        lines.append("")
    if rcnet_train:
        lines += [
            "## RC-Net training-step parity",
            "",
            "One optimization step on one batch with identical converted "
            "weights - the reference's label synthesis "
            "(rcnet_main.py:304-332), train-mode BN forward and "
            "positive-class-weighted masked BCE (rcnet_model.py:125-166) "
            "vs the riders train-step loss_fn "
            "(tests/test_reference_parity.py::"
            "test_rcnet_train_step_parity):",
            "",
            f"- loss: reference {rcnet_train['ref_loss']:.8f} vs riders "
            f"{rcnet_train['riders_loss']:.8f} "
            f"(rel {rcnet_train['rel_loss'] * 100:.5f}%, budget 1e-3%)",
            f"- gradients: all {rcnet_train['n_compared']} non-degenerate "
            f"leaves (of {rcnet_train['n_leaves']}) agree with cosine "
            f">= {rcnet_train['worst_cos']:.6f} and relative L2 error "
            f"<= {rcnet_train['worst_rel']:.2e} after mapping the torch "
            "grads through the weight converter",
            "",
        ]
    if interp:
        lines += [
            "## 'interp' scale-map mode: device IDW vs host-exact griddata",
            "",
            "The non-RCNet `interp` mode densifies radar scale knots; the "
            "device path is an IDW approximation of the reference's "
            "Qhull/griddata Interpolator2D (modules/interpolator.py:20-50)."
            "  Metric deltas of the FULL val protocol on the synthetic "
            "mini-scenes, device IDW (`rcnet_interp='interp'`) vs the "
            "host-exact option (`'interp-exact'`, scipy griddata via "
            "pure_callback - available in validate_sml):",
            "",
            "| metric | interp (IDW) | interp-exact (griddata) | rel. delta |",
            "|---|---|---|---|",
        ]
        for k in METRIC_KEYS:
            a, b = interp["idw"][k], interp["exact"][k]
            rel = abs(a - b) / max(abs(b), 1e-9)
            lines.append(f"| {k} | {a:.6f} | {b:.6f} | {rel * 100:.4f}% |")
        lines += [
            "",
            f"Max relative delta: {interp['max_rel'] * 100:.4f}% "
            "(tests/test_drivers.py::test_validate_sml_interp_modes).",
            "",
        ]
    lines += [
        "Regenerate: `python -m pytest tests/test_reference_parity.py "
        "tests/test_drivers.py::test_validate_sml_interp_modes -q --slow`.",
        "Raw metric values are tracked in `.parity_fragments/*.json` - "
        "the data source this document is assembled from "
        "(tests/parity_common.py).",
    ]
    with open(os.path.join(REPO_ROOT, "PARITY.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
