"""Logging, metric tables and profiling hooks.

Covers the reference's three observability channels (SURVEY.md 5.5):
console+file ``log`` (utils/log_utils.py:7-29), hyperparameter dump
``log_params`` (:67-70), the 7-metric evaluation table
(``log_evaluation_results``, :74-98), and scalar summaries.  TensorBoard
image mosaics are replaced by a dependency-light JSONL scalar stream
(`ScalarWriter`) that TensorBoard-less environments can also consume, plus
optional TB event writing when tensorboardX/tf is importable.

Profiling (SURVEY.md 5.1 - the reference has only wall-clock prints) is
first-class: ``StepTimer`` tracks per-stage step times with elapsed/
remaining estimates (train_zju.py:412-417), and ``trace`` wraps
jax.profiler for on-demand device traces.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Optional

import numpy as np


def log(message: str, filepath: Optional[str] = None) -> None:
    """Console + append-to-file logging (log_utils.py:7-29)."""
    print(message)
    if filepath:
        os.makedirs(os.path.dirname(filepath) or ".", exist_ok=True)
        with open(filepath, "a") as f:
            f.write(message + "\n")


def log_params(filepath: Optional[str], params: Dict[str, Any]) -> None:
    """Dump a configuration/kwargs mapping (log_utils.py:67-70)."""
    for k in sorted(params):
        log(f"{k}={params[k]}", filepath)


def log_evaluation_results(title: str, results: Dict[str, float],
                           step: int = -1,
                           log_path: Optional[str] = None) -> None:
    """7-metric table printer (log_utils.py:74-98 format)."""
    log(title + ":", log_path)
    keys = ["mae", "rmse", "imae", "irmse", "abs_rel", "sq_rel", "delta1"]
    header = "{:>8}  ".format("step") + "".join(
        "{:>10}  ".format(k.upper()) for k in keys)
    row = "{:>8}  ".format(step) + "".join(
        "{:>10.4f}  ".format(float(results[k])) for k in keys)
    log(header, log_path)
    log(row, log_path)


class ScalarWriter:
    """JSONL scalar stream with optional TensorBoard mirroring."""

    def __init__(self, directory: str, tag: str = "train"):
        os.makedirs(directory, exist_ok=True)
        self.path = os.path.join(directory, f"scalars-{tag}.jsonl")
        self._file = open(self.path, "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter  # optional
            self._tb = SummaryWriter(os.path.join(directory, f"tb-{tag}"))
        except Exception:
            pass

    def write(self, step: int, scalars: Dict[str, Any]) -> None:
        rec = {"step": int(step)}
        for k, v in scalars.items():
            try:
                rec[k] = float(np.asarray(v))
            except Exception:
                continue
        self._file.write(json.dumps(rec) + "\n")
        self._file.flush()
        if self._tb is not None:
            for k, v in rec.items():
                if k != "step":
                    self._tb.add_scalar(k, v, step)

    def write_histograms(self, step: int,
                         arrays: Dict[str, Any]) -> None:
        """Distribution summaries - the reference's TB histogram channel
        (log_utils.log_summary:102-287, rcnet_model.log_summary:267-476).
        Full histograms go to TensorBoard when available; the JSONL
        stream records quantile digests either way."""
        rec: Dict[str, Any] = {"step": int(step)}
        for k, v in arrays.items():
            a = np.asarray(v, np.float32).reshape(-1)
            if a.size == 0:
                continue
            q = np.quantile(a, [0.0, 0.25, 0.5, 0.75, 1.0])
            rec[k] = {"min": float(q[0]), "p25": float(q[1]),
                      "median": float(q[2]), "p75": float(q[3]),
                      "max": float(q[4]), "mean": float(a.mean())}
            if self._tb is not None:
                self._tb.add_histogram(k, a, step)
        self._file.write(json.dumps({"histograms": rec}) + "\n")
        self._file.flush()

    def close(self) -> None:
        self._file.close()
        if self._tb is not None:
            self._tb.close()


class StepTimer:
    """Per-step timing with elapsed/remaining estimates
    (train_zju.py:412-417, rcnet_main.py:413-418)."""

    def __init__(self, total_steps: int):
        self.total_steps = total_steps
        self.start = time.time()
        self.steps = 0

    def tick(self, n: int = 1) -> None:
        self.steps += n

    def stats(self) -> Dict[str, float]:
        elapsed = time.time() - self.start
        rate = self.steps / elapsed if elapsed > 0 else 0.0
        remaining = ((self.total_steps - self.steps) / rate
                     if rate > 0 else float("inf"))
        return {
            "elapsed_h": elapsed / 3600.0,
            "remaining_h": remaining / 3600.0,
            "steps_per_s": rate,
        }

    def format(self) -> str:
        s = self.stats()
        return (f"Step={self.steps:6d}/{self.total_steps} "
                f"Elapsed={s['elapsed_h']:.2f}h "
                f"Remaining={s['remaining_h']:.2f}h "
                f"({s['steps_per_s']:.2f} it/s)")


def save_image_mosaic(path: str, panels, max_depth: float = 80.0) -> None:
    """Dump a mosaic of image/depth panels as one PNG - the
    dependency-light stand-in for the reference's TensorBoard image grids
    (log_utils.log_summary:102-287, rcnet_model.log_summary:267-476).

    `panels` is a list of (H, W[, 3]) arrays laid out horizontally, or a
    list of such lists laid out as a grid (one inner list per mosaic
    row).  RGB panels pass through, single-channel panels are
    viridis-colorized against max_depth.
    """
    if panels and isinstance(panels[0], (list, tuple)):
        grid = [_mosaic_row(row, max_depth) for row in panels]
        width = max(r.shape[1] for r in grid)
        grid = [np.pad(r, ((0, 0), (0, width - r.shape[1]), (0, 0)))
                for r in grid]
        mosaic = np.concatenate(grid, axis=0)
    else:
        mosaic = _mosaic_row(panels, max_depth)
    from PIL import Image
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(np.uint8(mosaic * 255)).save(path)


def _mosaic_row(panels, max_depth: float) -> np.ndarray:
    from riders_tpu.io.depthio import _viridis

    rows = []
    target_h = max(p.shape[0] for p in panels)
    for p in panels:
        p = np.asarray(p, np.float32)
        if p.ndim == 2:
            p = _viridis(np.clip(p / max_depth, 0, 1))[..., :3]
        if p.max() > 1.0:
            p = p / 255.0
        if p.shape[0] != target_h:
            from PIL import Image
            scale = target_h / p.shape[0]
            img = Image.fromarray(np.uint8(np.clip(p, 0, 1) * 255))
            img = img.resize((int(p.shape[1] * scale), target_h),
                             Image.NEAREST)
            p = np.asarray(img, np.float32) / 255.0
        rows.append(np.clip(p, 0, 1))
    return np.concatenate(rows, axis=1)


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
