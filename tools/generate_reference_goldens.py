#!/usr/bin/env python
"""Dump golden outputs from the PyTorch reference for parity checking.

Run this in an environment with the REFERENCE's dependencies (torch,
torchvision, timm 0.6.12; see /root/reference/environment.yaml) and the
ZJU-Multispectrum dataset.  It executes the reference's own entry points
and captures, per frame of the chosen scenes:

  goldens/<scene>/int_depth/<id>.npy      stage-1 aligned inverse depth
  goldens/<scene>/int_scales/<id>.npy     stage-1 scale map
  goldens/<scene>/sml_depth/<id>.png      stage-3 final depth (x256 PNG)
  goldens/metrics.json                    the 7-metric table per checkpoint

The riders-tpu side then scores parity with:

  riders eval-dir --dataset zju --root <root> --results goldens
  python tools/compare_goldens.py goldens <riders_out>

(BASELINE.md parity procedure: reference runs establish the golden metrics
empirically since the repo publishes none; the riders build must stay
within 1% on MAE/RMSE/delta1.)
"""

import argparse
import json
import os
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference",
                    help="reference repo checkout")
    ap.add_argument("--root", required=True, help="ZJU dataset root")
    ap.add_argument("--checkpoint", required=True, help="SML .pth")
    ap.add_argument("--scenes", nargs="+", default=[
        "2023-10-20-10-07-22", "2023-10-20-10-28-46",
        "2023-10-20-14-35-31"])
    ap.add_argument("--out", default="goldens")
    ap.add_argument("--interp", default="rcnet_0.1")
    args = ap.parse_args()

    sys.path.insert(0, args.reference)
    import torch
    from modules.estimator import Optimizer
    from modules.midas.midas_net_custom import MidasNet_small_videpth
    import modules.midas.transforms as transforms
    import modules.midas.utils as mutils
    import data.UTV_dataset as UTV
    import data.data_utils as data_utils

    device = torch.device("cuda" if torch.cuda.is_available() else "cpu")
    tfm = transforms.get_transforms(288, 288, depth_predictor="midas_small")
    model = MidasNet_small_videpth(device=device, min_pred=0.1,
                                   max_pred=255.0, in_channels=3)
    model.load(args.checkpoint)
    model.eval()

    for scene in args.scenes:
        sroot = os.path.join(args.root, scene)
        names = sorted(os.listdir(os.path.join(sroot, "thermal_undistort")))
        for d in ("int_depth", "int_scales", "sml_depth"):
            os.makedirs(os.path.join(args.out, scene, d), exist_ok=True)
        for name in names:
            fid = os.path.splitext(name)[0]
            image = UTV.load_input_image(
                os.path.join(sroot, "thermal_undistort", name))
            mono = UTV.load_sparse_depth(
                os.path.join(sroot, "any", fid + ".png"))
            radar = UTV.load_sparse_depth(
                os.path.join(sroot, "radar_png", fid + ".png"))
            rcnet = UTV.load_sparse_depth(os.path.join(
                args.root, "output", args.interp, scene,
                "depth_predicted", fid + ".png"))
            if rcnet.sum() == 0:
                rcnet = radar

            rv = (radar > 0) & (radar < 100.0)
            radar_inv = np.where(rv, 1.0 / np.where(rv, radar, 1.0), 0.0)
            qv = (rcnet > 0) & (rcnet < 100.0)
            rc_inv = np.where(qv, 1.0 / np.where(qv, rcnet, 1.0), 0.0)

            ga = Optimizer(estimate=mono, target=radar_inv, valid=rv,
                           depth_type="inv")
            ga.optimize_scale()
            ga.apply_scale()
            ga.clamp_min_max(clamp_min=0.1, clamp_max=255.0)
            int_depth = ga.output.astype(np.float32)

            scales = np.ones_like(int_depth)
            scales[qv] = rc_inv[qv] / int_depth[qv]
            scales[rv] = radar_inv[rv] / int_depth[rv]
            scales = mutils.normalize_unit_range(scales.astype(np.float32))

            np.save(os.path.join(args.out, scene, "int_depth",
                                 fid + ".npy"), int_depth)
            np.save(os.path.join(args.out, scene, "int_scales",
                                 fid + ".npy"), scales)

            sample = {"image": image.astype(np.float32),
                      "int_depth": int_depth, "int_scales": scales,
                      "int_depth_no_tf": int_depth}
            sample = tfm(sample)
            x = torch.cat([sample["int_depth"], sample["int_scales"]], 0)
            gray = (sample["image"][0] * 0.299 + sample["image"][1] * 0.587
                    + sample["image"][2] * 0.114).unsqueeze(0)
            x = torch.cat([x, gray], 0).to(device)
            d = sample["int_depth_no_tf"].to(device)
            with torch.no_grad():
                pred = model.forward(x.unsqueeze(0), d.unsqueeze(0))
                depth = torch.nn.functional.interpolate(
                    1.0 / pred, size=image.shape[:2], mode="bicubic",
                    align_corners=False).squeeze().cpu().numpy()
            data_utils.save_depth(depth, os.path.join(
                args.out, scene, "sml_depth", fid + ".png"))
        print(f"{scene}: {len(names)} frames")


if __name__ == "__main__":
    main()
