#!/usr/bin/env python
"""Score riders-tpu outputs against reference goldens.

Usage: python tools/compare_goldens.py <goldens_dir> <riders_out_dir> \
           [--root <dataset_root>] [--max-depth 50]

Compares, per frame:
  * stage-1 int_depth / int_scales (.npy) -> max/mean abs deviation,
  * final sml_depth PNGs -> the 7-metric table on both sides plus the
    relative metric deviation (the <=1% parity budget of BASELINE.md).
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from riders_tpu.io import depthio


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("goldens")
    ap.add_argument("riders_out")
    ap.add_argument("--root", default=None,
                    help="dataset root (for GT-based metric comparison)")
    ap.add_argument("--min-depth", type=float, default=0.0)
    ap.add_argument("--max-depth", type=float, default=50.0)
    args = ap.parse_args()

    scenes = sorted(d for d in os.listdir(args.goldens)
                    if os.path.isdir(os.path.join(args.goldens, d)))
    report = {}
    for scene in scenes:
        gdir = os.path.join(args.goldens, scene)
        rdir = os.path.join(args.riders_out, scene)
        devs = {"int_depth": [], "int_scales": [], "depth": []}
        for name in sorted(os.listdir(os.path.join(gdir, "sml_depth"))):
            fid = os.path.splitext(name)[0]
            for key in ("int_depth", "int_scales"):
                gp = os.path.join(gdir, key, fid + ".npy")
                rp = os.path.join(rdir, key, fid + ".npy")
                if os.path.exists(gp) and os.path.exists(rp):
                    g, r = np.load(gp), np.load(rp)
                    devs[key].append(float(np.abs(g - r).mean()))
            gp = os.path.join(gdir, "sml_depth", name)
            rp = os.path.join(rdir, "sml_depth", name)
            if os.path.exists(gp) and os.path.exists(rp):
                g = depthio.load_depth(gp)
                r = depthio.load_depth(rp)
                devs["depth"].append(float(np.abs(g - r).mean()))
        report[scene] = {k: (float(np.mean(v)) if v else None)
                         for k, v in devs.items()}
        print(scene, report[scene])

    if args.root:
        from riders_tpu.core.config import zju_config
        from riders_tpu.pipelines.drivers import evaluate_results_dir
        cfg = zju_config(root=args.root)
        cfg = cfg.replace(dataset=cfg.dataset.__class__(
            **{**cfg.dataset.__dict__, "val_scenes": tuple(scenes)}))
        print("— golden metrics —")
        gm = evaluate_results_dir(cfg, args.goldens)
        print("— riders metrics —")
        rm = evaluate_results_dir(cfg, args.riders_out)
        rel = {k: abs(rm[k] - gm[k]) / max(abs(gm[k]), 1e-9)
               for k in gm}
        print("relative deviation:", json.dumps(rel, indent=2))
        budget = all(rel[k] <= 0.01 for k in ("mae", "rmse", "delta1"))
        print("within 1% parity budget:", budget)


if __name__ == "__main__":
    main()
