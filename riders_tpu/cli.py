"""Unified command-line interface.

Replaces the reference's six forked __main__ scripts and hard-coded kwarg
blocks (SURVEY.md 5.6) with one entry point over dataset presets:

    riders train-sml   --dataset zju --root /data/ZJU --ckpt /log/sml
    riders train-rcnet --dataset zju --root /data/ZJU --ckpt /log/rcnet
    riders run-rcnet   --dataset zju --root /data/ZJU --ckpt /log/rcnet \
                       --output /data/ZJU/output
    riders val-sml     --dataset zju --root /data/ZJU --ckpt /log/sml
    riders eval-dir    --dataset zju --root /data/ZJU --results /out/SML
    riders preprocess  --dataset zju --root /raw --output /data/ZJU
    riders bench
"""

from __future__ import annotations

import argparse
import dataclasses
import sys


def _load_config(args):
    from riders_tpu.core.config import ntu_config, zju_config
    factory = {"zju": zju_config, "ntu": ntu_config}[args.dataset]
    cfg = factory(root=args.root or "")
    if getattr(args, "train_scenes", None) or getattr(args, "val_scenes",
                                                      None):
        ds = cfg.dataset
        if args.train_scenes:
            ds = dataclasses.replace(ds,
                                     train_scenes=tuple(args.train_scenes))
        if args.val_scenes:
            ds = dataclasses.replace(ds, val_scenes=tuple(args.val_scenes))
        cfg = cfg.replace(dataset=ds)
    if getattr(args, "rcnet_interp", None):
        cfg = cfg.replace(sml_train=dataclasses.replace(
            cfg.sml_train, rcnet_interp=args.rcnet_interp))
    if getattr(args, "threshold", None) is not None:
        cfg = cfg.replace(rcnet=dataclasses.replace(
            cfg.rcnet, response_threshold=args.threshold))
    if getattr(args, "batch_size", None):
        cfg = cfg.replace(
            sml_train=dataclasses.replace(cfg.sml_train,
                                          batch_size=args.batch_size),
            rcnet_train=dataclasses.replace(cfg.rcnet_train,
                                            batch_size=args.batch_size))
    return cfg


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="riders", description="RIDERS-TPU: radar + thermal metric "
        "depth on TPU")
    sub = parser.add_subparsers(dest="command", required=True)

    def common(p, needs_root=True):
        p.add_argument("--dataset", choices=["zju", "ntu"], default="zju")
        if needs_root:
            p.add_argument("--root", required=True,
                           help="dataset root directory")
        p.add_argument("--log", default=None, help="log file path")
        p.add_argument("--train-scenes", nargs="*", default=None,
                       help="override the preset's training scenes")
        p.add_argument("--val-scenes", nargs="*", default=None,
                       help="override the preset's validation scenes")
        p.add_argument("--multihost", action="store_true",
                       help="join a multi-host JAX job before building the "
                       "mesh (jax.distributed; coordinator via env or "
                       "--coordinator)")
        p.add_argument("--coordinator", default=None,
                       help="coordinator address for --multihost")
        p.add_argument("--num-processes", type=int, default=None)
        p.add_argument("--process-id", type=int, default=None)

    p = sub.add_parser("train-sml", help="train the Scale Map Learner")
    common(p)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--rcnet-interp", default=None,
                   help="scale-map knot source: rcnet_<thr> (stage-2 "
                   "PNGs), none (raw radar), interp (dense IDW)")
    p.add_argument("--max-steps", type=int, default=None)

    p = sub.add_parser("train-rcnet", help="train RC-Net")
    common(p)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--max-steps", type=int, default=None)

    p = sub.add_parser("run-rcnet",
                       help="generate quasi-dense radar depth PNGs")
    common(p)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--threshold", type=float, default=None)

    p = sub.add_parser("val-sml", help="validate SML checkpoints")
    common(p)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--output", default=None)
    p.add_argument("--save-output", action="store_true")
    p.add_argument("--rcnet-interp", default=None)
    p.add_argument("--depth-predictor", default=None,
                   help="apply the per-mono-model test-time transform "
                   "tables (e.g. midas_small, dpt_beit_large_512)")
    p.add_argument("--void-sparsity", type=int, default=150,
                   help="VOID statistics row for --depth-predictor")

    p = sub.add_parser("val-rcnet", help="validate RC-Net checkpoints")
    common(p)
    p.add_argument("--ckpt", required=True)

    p = sub.add_parser("eval-dir",
                       help="score a directory of predicted depth PNGs")
    common(p)
    p.add_argument("--results", required=True)
    p.add_argument("--subdir", default="sml_depth")

    p = sub.add_parser("preprocess",
                       help="project point clouds to depth PNG trees")
    common(p)
    p.add_argument("--output", required=True)

    p = sub.add_parser("bench", help="run the fused-inference benchmark")

    args = parser.parse_args(argv)

    if args.command == "bench":
        import bench
        bench.main()
        return 0

    if getattr(args, "multihost", False):
        from riders_tpu.parallel.sharding import initialize_multihost
        initialize_multihost(args.coordinator, args.num_processes,
                             args.process_id)

    cfg = _load_config(args)

    if args.command == "train-sml":
        from riders_tpu.pipelines.drivers import train_sml
        train_sml(cfg, args.ckpt, resume=args.resume, log_path=args.log,
                  max_steps=args.max_steps)
    elif args.command == "train-rcnet":
        from riders_tpu.pipelines.drivers import train_rcnet
        train_rcnet(cfg, args.ckpt, resume=args.resume, log_path=args.log,
                    max_steps=args.max_steps)
    elif args.command == "run-rcnet":
        from riders_tpu.pipelines.drivers import run_rcnet
        run_rcnet(cfg, args.ckpt, args.output, log_path=args.log)
    elif args.command == "val-sml":
        from riders_tpu.pipelines.drivers import validate_sml
        if args.depth_predictor:
            from riders_tpu.core.normalization import (apply_to_config,
                                                       test_time_transforms)
            spec = test_time_transforms(args.depth_predictor, "void",
                                        args.void_sparsity,
                                        cfg.dataset.image_shape)
            cfg = apply_to_config(cfg, spec)
        validate_sml(cfg, args.ckpt, output_path=args.output,
                     save_output=args.save_output, log_path=args.log)
    elif args.command == "val-rcnet":
        from riders_tpu.pipelines.drivers import validate_rcnet
        validate_rcnet(cfg, args.ckpt, log_path=args.log)
    elif args.command == "eval-dir":
        from riders_tpu.pipelines.drivers import evaluate_results_dir
        evaluate_results_dir(cfg, args.results, depth_subdir=args.subdir,
                             log_path=args.log)
    elif args.command == "preprocess":
        from riders_tpu.io.preprocess.project import preprocess_dataset
        preprocess_dataset(cfg, args.root, args.output)
    return 0


if __name__ == "__main__":
    sys.exit(main())
