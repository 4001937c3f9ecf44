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

import queue
import threading
from typing import Callable, Dict, Iterable, Iterator, Optional

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
