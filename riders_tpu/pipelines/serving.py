"""Production serving loop for the fused pipeline.

The tunnel/PCIe boundary costs dominate naive per-frame serving (~30 ms
per dispatch round-trip here; SURVEY.md 3.1 counts >=4 host<->device
crossings per frame in the reference).  This loop exploits JAX's async
dispatch to overlap the three phases:

    host decode/batch (threads)  ->  H2D upload  ->  device fused compute

The device is kept busy by enqueueing batch i+1 before blocking on batch
i's output; with the fused pipeline at ~2.2 ms/frame device time, a single
upload thread sustains it comfortably.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Callable, Dict, Iterable, Iterator, Optional, Sequence

import numpy as np

import jax


class FusedServer:
    """Pipelined executor over a jitted fused function.

    Args:
      fused_fn: fn(rc_vars, sml_vars, batch) -> depth (the jitted fused
        pipeline from pipelines/fused.py).
      rc_vars, sml_vars: model variables (device-resident).
      depth: number of batches in flight (2 = double buffering).
    """

    def __init__(self, fused_fn: Callable, rc_vars, sml_vars,
                 depth: int = 2):
        self.fused_fn = fused_fn
        self.rc_vars = jax.device_put(rc_vars)
        self.sml_vars = jax.device_put(sml_vars)
        self.depth = depth

    def run(self, batches: Iterable[Dict[str, np.ndarray]]
            ) -> Iterator[np.ndarray]:
        """Stream host batches through the device; yields depth maps in
        order.  Upload happens on a worker thread while the device computes
        the previous batch (JAX dispatch is async - results are only
        blocked on at yield time).

        The uploader thread is always stopped and joined, including when
        the caller abandons the generator early (generator .close() /
        GeneratorExit runs the finally block)."""
        upload_q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        stop = threading.Event()

        def uploader():
            try:
                for batch in batches:
                    staged = jax.device_put(batch)
                    # Bounded put that aborts when the consumer went away
                    # (a plain blocking put would deadlock the join below).
                    while not stop.is_set():
                        try:
                            upload_q.put(staged, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            finally:
                upload_q.put(None)

        thread = threading.Thread(target=uploader, daemon=True)
        thread.start()

        try:
            in_flight = []
            while True:
                batch = upload_q.get()
                if batch is None:
                    break
                out = self.fused_fn(self.rc_vars, self.sml_vars, batch)
                in_flight.append(out)
                if len(in_flight) >= self.depth:
                    yield np.asarray(in_flight.pop(0))
            for out in in_flight:
                yield np.asarray(out)
        finally:
            stop.set()
            # Drain so a blocked uploader can place its sentinel and exit.
            while True:
                try:
                    if upload_q.get_nowait() is None:
                        break
                except queue.Empty:
                    if not thread.is_alive():
                        break
            thread.join(timeout=10.0)


class FusedInferenceDataset:
    """On-disk frame loader for the fused RC-Net+SML serving path.

    Each frame is the interchange triple the reference's stage-2 pipeline
    reads from disk (run_rcnet_zju.py:138-166 loads image + radar .npy;
    val_zju.py:210-238 loads the mono prior as a x256 PNG16): here
    `<name>_image.png` (RGB), `<name>_mono.png` (PNG16 x256 inverse-depth
    prior), `<name>_radar.npy` (n x 3 (u, v, depth)).  Samples carry the
    exact batch keys `pipelines/fused.py` consumes, so
    BatchLoader(FusedInferenceDataset(...)) feeds FusedServer directly.

    `compact=True` stages the image as uint8 and the mono prior as its
    raw PNG16 x256 fixed-point code (uint16): 3.2x fewer host->device
    bytes per frame, with the [0,1] / x256 decode running on device
    (fused fn dtype dispatch).  Falls back to float32 for depth maps
    that overflow the 16-bit code (>255 m, stored as mode-'I' PNGs).
    The fallback is PER-DATASET, decided once from the PNG headers: a
    per-frame fallback could mix uint16 codes and decoded floats in one
    batch, numpy stacking would promote the codes to float32, and the
    device dtype dispatch would then skip their /256 decode - silently
    scaling those priors 256x.
    """

    def __init__(self, frame_dirs_or_names: Sequence[str], root: str = "",
                 max_points: int = 48, compact: bool = False):
        self.names = [os.path.join(root, n) for n in frame_dirs_or_names]
        self.max_points = max_points
        self.compact = compact
        self._mono_u16: Optional[bool] = None

    def _mono_is_uint16(self) -> bool:
        """True iff EVERY mono PNG in the dataset carries a 16-bit code.

        Header-only probe (PIL.Image.open is lazy), cached; racing
        loader threads recompute the same answer idempotently."""
        if self._mono_u16 is None:
            from PIL import Image
            ok = True
            for base in self.names:
                with Image.open(base + "_mono.png") as im:
                    if im.mode not in ("I;16", "I;16B", "I;16L"):
                        ok = False
                        break
            self._mono_u16 = ok
        return self._mono_u16

    def __len__(self) -> int:
        return len(self.names)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        from PIL import Image

        from riders_tpu.io import depthio
        base = self.names[index]
        if self.compact:
            image = np.asarray(
                Image.open(base + "_image.png").convert("RGB"), np.uint8)
            mono = np.asarray(Image.open(base + "_mono.png"))
            if self._mono_is_uint16():
                mono = mono.astype(np.uint16, copy=False)
            else:
                mono = (mono.astype(np.float32) / 256.0).clip(min=0)
        else:
            image = depthio.load_image(
                base + "_image.png", normalize=True).astype(np.float32)
            mono = depthio.load_depth(base + "_mono.png")
        points = depthio.load_radar_points(base + "_radar.npy")
        pts, mask = depthio.pad_points(points, self.max_points)
        return {"image": image, "mono_pred": mono,
                "radar_points": pts, "point_mask": mask}
