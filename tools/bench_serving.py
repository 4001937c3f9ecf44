"""Host-fed serving benchmark for the fused RC-Net+SML pipeline.

The headline bench (bench.py) measures pure device time on device-resident
synthetic batches.  This tool measures the PRODUCTION path: frames on disk
(PNG RGB + PNG16 mono prior + radar .npy, the reference's interchange
formats), decoded and staged by BatchLoader's worker threads, streamed
through FusedServer's pipelined executor over the tunneled TPU.

Staging is compact by default (uint8 image + uint16 PNG16 codes, 3.2x
fewer H2D bytes, normalized/decoded on device); --f32 stages float32.

Reports JSON lines:
  * tunnel H2D MB/s     - raw upload bandwidth before/after the fused
    executable is loaded (this tunnel degrades ~15-30x after - see
    PERF.md "Host-fed serving")
  * host loader fps     - PNG decode + stack + device_put throughput
  * host-fed serving fps- sustained end-to-end, pipelined (FusedServer)
  * blocking batch latency p50/p99 - single-request (no overlap)

Usage: python tools/bench_serving.py [--zju] [--f32] [--frames N]
                                     [--epochs N]
Reference anchor for the protocol: the reference times its own serving
loop host-fed the same way (RCNet/run_rcnet_zju.py:277-280).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

FRAMES = 128
EPOCHS = 2


def synthesize_tree(root: str, n_frames: int, H: int, W: int, n_pts: int,
                    seed: int = 0):
    """Write a synthetic on-disk scene in the interchange formats."""
    from riders_tpu.io import depthio
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed)
    names = []
    for i in range(n_frames):
        name = f"frame_{i:04d}"
        base = os.path.join(root, name)
        if not os.path.exists(base + "_radar.npy"):
            from PIL import Image
            img = (rng.random((H, W, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(base + "_image.png")
            depth = (5.0 + 50.0 * rng.random((H, W))).astype(np.float32)
            depthio.save_depth((1.0 / depth) / 0.05, base + "_mono.png")
            u = rng.integers(0, W, n_pts)
            v = rng.integers(0, H, n_pts)
            pts = np.stack([u, v, depth[v, u]], axis=1).astype(np.float32)
            np.save(base + "_radar.npy", pts)
        names.append(name)
    return names


def _h2d_mbps(arr, n=3):
    jax.block_until_ready(jax.device_put(arr))
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(jax.device_put(arr))
    return arr.nbytes * n / (time.perf_counter() - t0) / 1e6


def main():
    preset = "zju" if "--zju" in sys.argv[1:] else "ntu"
    compact = "--f32" not in sys.argv[1:]
    n_frames = FRAMES
    epochs = EPOCHS
    for i, a in enumerate(sys.argv[1:]):
        if a == "--frames":
            n_frames = int(sys.argv[1:][i + 1])
        if a == "--epochs":
            epochs = int(sys.argv[1:][i + 1])

    import bench
    from riders_tpu.io.input_pipeline import BatchLoader
    from riders_tpu.pipelines.serving import (FusedInferenceDataset,
                                              FusedServer)

    # --- decode-only scaling (no device): --decode-scaling ------------
    # PNG inflate is zlib inside the GIL, so thread decode tops out near
    # single-core rate; this measures the process-pool decode path
    # (BatchLoader num_workers) at increasing worker counts and exits.
    if "--decode-scaling" in sys.argv[1:]:
        H, W = (512, 640)
        B = 16
        root = f"/tmp/riders_serving_{preset}_{H}x{W}"
        names = synthesize_tree(root, n_frames, H, W,
                                40 if preset == "ntu" else 30)
        ds = FusedInferenceDataset(names, root=root, max_points=48,
                                   compact=compact)
        results = {}
        for mode, n_w in [("threads", 8), ("procs", 2), ("procs", 4),
                          ("procs", 8), ("procs", 12), ("procs", 16)]:
            kw = ({"num_threads": n_w} if mode == "threads"
                  else {"num_workers": n_w})
            ld = BatchLoader(ds, batch_size=B, shuffle=False, prefetch=3,
                             drop_last=True, device_put=False, **kw)
            try:
                for _ in ld.epoch():      # warm page cache / fork pool
                    pass
                t0 = time.perf_counter()
                n = 0
                for _ in range(epochs):
                    for b in ld.epoch():
                        n += B
                results[f"{mode}{n_w}"] = round(
                    n / (time.perf_counter() - t0), 1)
            finally:
                ld.close()
            print(json.dumps({"metric": f"decode-only fps ({preset}, "
                                        f"{'compact' if compact else 'f32'}"
                                        f", {mode} x{n_w})",
                              "value": results[f"{mode}{n_w}"],
                              "unit": "fps"}))
        print(json.dumps({"metric": "decode-only scaling summary",
                          **results}))
        return

    fused, rc_vars, sml_vars, dev_batch = bench.build(preset)
    B, H, W = dev_batch["image"].shape[:3]
    K = dev_batch["radar_points"].shape[1]
    n_real = 40 if preset == "ntu" else 30

    probe = np.random.random((B, H, W, 3)).astype(np.float32)
    pre_mbps = _h2d_mbps(probe)

    root = f"/tmp/riders_serving_{preset}_{H}x{W}"
    names = synthesize_tree(root, n_frames, H, W, n_real)
    ds = FusedInferenceDataset(names, root=root, max_points=K,
                               compact=compact)

    fused_j = jax.jit(fused)

    def host_batches(n_epochs):
        hl = BatchLoader(ds, batch_size=B, shuffle=False, num_threads=8,
                         prefetch=3, drop_last=True, device_put=False)
        for _ in range(n_epochs):
            yield from hl.epoch()

    server = FusedServer(fused_j, rc_vars, sml_vars, depth=2)
    for _ in server.run(host_batches(1)):  # compile + warm cache/pools
        pass
    post_mbps = _h2d_mbps(probe)
    print(json.dumps({"metric": "tunnel H2D MB/s (pre/post fused load)",
                      "pre": round(pre_mbps), "post": round(post_mbps),
                      "unit": "MB/s"}))

    # --- loader-only: host decode + stack + device_put throughput ------
    ld = BatchLoader(ds, batch_size=B, shuffle=False, num_threads=8,
                     prefetch=3, drop_last=True)
    t0 = time.perf_counter()
    n = 0
    for _ in range(epochs):
        for b in ld.epoch():
            jax.block_until_ready(b["image"])
            n += B
    loader_fps = n / (time.perf_counter() - t0)
    print(json.dumps({"metric": f"host loader fps ({preset}, "
                                f"{'compact' if compact else 'f32'})",
                      "value": round(loader_fps, 1), "unit": "fps"}))

    # --- pipelined serving: BatchLoader -> FusedServer -----------------
    t0 = time.perf_counter()
    n = 0
    for out in server.run(host_batches(epochs)):
        n += out.shape[0]
    serving_fps = n / (time.perf_counter() - t0)
    print(json.dumps({"metric": f"host-fed serving fps ({preset}, "
                                f"{'compact' if compact else 'f32'})",
                      "value": round(serving_fps, 1), "unit": "fps",
                      "vs_baseline": round(serving_fps / 500.0, 3)}))

    # --- blocking single-request latency (no overlap) -------------------
    lat = []
    for batch in host_batches(1):
        t0 = time.perf_counter()
        staged = jax.device_put(batch)
        np.asarray(fused_j(rc_vars, sml_vars, staged))
        lat.append((time.perf_counter() - t0) * 1e3)
    lat = np.asarray(lat[1:])  # drop the first (cache effects)
    print(json.dumps({
        "metric": f"blocking batch-{B} latency ({preset}, "
                  f"{'compact' if compact else 'f32'})",
        "p50_ms": round(float(np.percentile(lat, 50)), 2),
        "p99_ms": round(float(np.percentile(lat, 99)), 2),
        "unit": "ms"}))


if __name__ == "__main__":
    main()
