"""Host input pipeline: dataset loading, augmentation, batching, prefetch.

Replaces the torch DataLoader stacks of the reference:

* ``SMLFrameDataset`` - the UTV sextuple loader (data/UTV_dataset.py:124-225)
  with its augmentations: crop-then-resize-back (:20-120), horizontal flip
  (:202-209), radar depth noise (:211-217), random rcnet-threshold swap
  (:183-186) and the all-zero-rcnet fallback to raw radar (:188-190), plus
  the HSV photometric augmentations of modules/midas/transforms.py:241-301.
* ``RCNetTrainDataset`` - the patch-training loader (data/datasets.py:119-
  288): edge-pad, sample `points_per_frame` radar points (repeat x100 when
  sparse), 10%-probability lidar pseudo-radar with x/z noise, per-point
  boxes and GT crops; photometric augmentation follows
  RCNet/rcnet_transforms.py semantics on the host.
* ``BatchLoader`` - threaded prefetching batcher feeding `jax.device_put`,
  replacing DataLoader worker processes.  Transfers overlap compute: the
  tunnel costs ~30 ms/dispatch, so batches are staged to the device ahead
  of consumption.

All emitted arrays are shape-static: images at the configured frame size,
point lists padded to the `max_points` bucket with masks.
"""

from __future__ import annotations

import queue
import threading
from contextlib import nullcontext as _nullcontext
from typing import Dict, Iterator, List, Sequence

import numpy as np

import jax

from riders_tpu.core.config import RidersConfig
from riders_tpu.io import depthio
from riders_tpu.io.manifest import FrameRecord, swap_rcnet_threshold


def _normalize_range(image01: np.ndarray, rng) -> np.ndarray:
    """Map a [0, 1] image to the configured intensity range
    (rcnet_transforms.normalize_images:245-270: [0,1], [-1,1] or
    [0,255])."""
    lo, hi = rng
    if (lo, hi) == (0.0, 1.0):
        return image01
    return (image01 * (hi - lo) + lo).astype(np.float32)


def _crop_resize_back(arrays: List[np.ndarray], shape, rng) -> List[np.ndarray]:
    """Random crop then resize back to original size
    (UTV_dataset.py:20-120, crop_type=['horizontal','vertical'])."""
    import cv2
    n_h, n_w = shape
    o_h, o_w = arrays[0].shape[:2]
    d_h, d_w = o_h - n_h, o_w - n_w
    x_start = rng.integers(0, max(d_w, 1))
    y_start = d_h // 2
    if rng.random() <= 0.30 and d_h > 0:
        y_start = rng.integers(0, d_h)
    out = []
    for a in arrays:
        c = a[y_start:y_start + n_h, x_start:x_start + n_w]
        out.append(cv2.resize(c, (o_w, o_h)))
    return out


def _hsv_adjust(image: np.ndarray, rng, brightness=None, contrast=None,
                saturation=None) -> np.ndarray:
    """HSV-channel photometric augmentation
    (modules/midas/transforms.py:241-301; each applied with p=0.5)."""
    import cv2
    img = image
    if brightness is not None and rng.random() < 0.5:
        hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)
        hsv[:, :, 2] = hsv[:, :, 2] * rng.uniform(*brightness)
        img = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)
    if contrast is not None and rng.random() < 0.5:
        hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)
        hsv[:, :, 1] = hsv[:, :, 1] * rng.uniform(*contrast)
        img = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)
    if saturation is not None and rng.random() < 0.5:
        hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)
        hsv[:, :, 1] = hsv[:, :, 1] * rng.uniform(*saturation)
        img = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)
    return img


class SMLFrameDataset:
    """Per-frame loader for the stage-1/3 pipeline."""

    def __init__(self, cfg: RidersConfig, records: Sequence[FrameRecord],
                 train: bool = False, seed: int = 0):
        self.cfg = cfg
        self.records = list(records)
        self.train = train
        self.seed = seed
        self._epoch = 0

    def __len__(self) -> int:
        return len(self.records)

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        t = cfg.sml_train
        rec = self.records[index]
        # Private per-(seed, epoch, index) stream: __getitem__ runs on
        # BatchLoader worker threads concurrently, so a shared mutable
        # Generator would corrupt silently; a derived stream is also
        # deterministic regardless of thread count/order.
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, self._epoch, index]))

        image = depthio.read_image_unit(rec.image)
        mono_pred = depthio.load_depth(rec.mono_pred)
        if rec.radar and rec.radar.endswith(".npy"):
            pts = depthio.load_radar_points(rec.radar)
            radar = depthio.scatter_points_to_map(pts, mono_pred.shape)
        else:
            radar = depthio.load_depth(rec.radar)
        # Host-side sparsity contract: the on-device alignment solve
        # gathers valid radar pixels into a fixed bucket
        # (AlignmentConfig.max_valid_pixels); a denser map would silently
        # truncate there, so fail loudly at load time instead.
        bound = cfg.alignment.max_valid_pixels
        if bound is not None and np.count_nonzero(radar) > bound:
            raise ValueError(
                f"radar map {rec.radar!r} has {np.count_nonzero(radar)} "
                f"nonzero pixels > alignment.max_valid_pixels={bound}; "
                "set alignment.max_valid_pixels=None (dense objective) "
                "for dense alignment targets")
        gt_interp = depthio.load_depth(rec.gt_interp)
        gt_sparse = depthio.load_depth(rec.gt_sparse)

        rcnet_path = rec.rcnet
        if rcnet_path is not None:
            if self.train and t.random_rcnet_thresholds:
                thr = rng.choice(list(t.random_rcnet_thresholds))
                rcnet_path = swap_rcnet_threshold(rec, float(thr))
            rcnet = depthio.load_depth(rcnet_path)
            if rcnet.sum() == 0:
                # empty quasi-dense map falls back to raw radar
                # (UTV_dataset.py:188-190)
                rcnet = radar.copy()
        else:
            rcnet = radar.copy()

        if self.train:
            if t.random_crop_size is not None and rng.random() > 0.2:
                image_c, mono_c, radar_c, gi_c, gs_c, rc_c = \
                    _crop_resize_back(
                        [image, mono_pred, radar, gt_interp, gt_sparse,
                         rcnet], t.random_crop_size, rng)
                image, mono_pred, radar = image_c, mono_c, radar_c
                gt_interp, gt_sparse, rcnet = gi_c, gs_c, rc_c
            if t.random_flip and rng.random() > 0.5:
                image = np.ascontiguousarray(image[:, ::-1])
                mono_pred = np.ascontiguousarray(mono_pred[:, ::-1])
                radar = np.ascontiguousarray(radar[:, ::-1])
                gt_interp = np.ascontiguousarray(gt_interp[:, ::-1])
                gt_sparse = np.ascontiguousarray(gt_sparse[:, ::-1])
                rcnet = np.ascontiguousarray(rcnet[:, ::-1])
            if t.random_radar_noise is not None and rng.random() > 0.5:
                lo, hi = t.random_radar_noise
                valid = radar > 0
                radar = radar.copy()
                radar[valid] += rng.normal(
                    lo, hi, int(valid.sum())).astype(np.float32)
            image = _hsv_adjust(image.astype(np.float32), rng)

        return {
            "image": image.astype(np.float32),
            "mono_pred": mono_pred.astype(np.float32),
            "radar": radar.astype(np.float32),
            "gt_interp": gt_interp.astype(np.float32),
            "gt_sparse": gt_sparse.astype(np.float32),
            "rcnet": rcnet.astype(np.float32),
        }


class RCNetTrainDataset:
    """Per-frame loader for RC-Net training (data/datasets.py:119-288)."""

    def __init__(self, cfg: RidersConfig, records: Sequence[FrameRecord],
                 seed: int = 0):
        self.cfg = cfg
        self.records = list(records)
        self.seed = seed
        self._epoch = 0

    def __len__(self) -> int:
        return len(self.records)

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def _photometric(self, image01: np.ndarray, rng) -> np.ndarray:
        """Batch-level photometric aug (rcnet_transforms.py:105-175
        semantics, applied per sample on the host): brightness/contrast/
        saturation each with p=0.5, factors U(range)."""
        t = self.cfg.rcnet_train
        img = image01
        if rng.random() < 0.5 * t.augmentation_probability:
            img = np.clip(img * rng.uniform(*t.random_brightness),
                          0.0, 1.0)
        if rng.random() < 0.5 * t.augmentation_probability:
            mean = img.mean()
            img = np.clip((img - mean) * rng.uniform(*t.random_contrast)
                          + mean, 0.0, 1.0)
        if rng.random() < 0.5 * t.augmentation_probability:
            gray = (0.299 * img[..., 0] + 0.587 * img[..., 1]
                    + 0.114 * img[..., 2])[..., None]
            img = np.clip(gray + (img - gray)
                          * rng.uniform(*t.random_saturation), 0.0, 1.0)
        return img.astype(np.float32)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        t = cfg.rcnet_train
        ph, pw = cfg.rcnet.patch_size
        pad_y, pad_x = ph // 2, pw // 2
        rec = self.records[index]
        # Per-(seed, epoch, index) stream; see SMLFrameDataset.__getitem__.
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, self._epoch, index]))

        image = depthio.load_image(rec.image, normalize=True)
        image = np.pad(image, ((pad_y, pad_y), (pad_x, pad_x), (0, 0)),
                       mode="edge")
        image = self._photometric(image, rng)
        image = _normalize_range(image, cfg.rcnet.normalized_image_range)

        points = depthio.load_radar_points(rec.radar)
        # Sample a fixed point count; sparse frames repeat x100 first
        # (datasets.py:203-206).
        if points.shape[0] <= t.points_per_frame:
            points = np.repeat(points, 100, axis=0)
        idx = rng.integers(0, points.shape[0], t.points_per_frame)
        points = points[idx].astype(np.float32)

        gt = depthio.load_depth(rec.gt_interp)

        # Pseudo-radar from perturbed lidar (datasets.py:214-240).
        if rng.random() < t.sample_probability_of_lidar:
            ly, lx = np.where(gt > 1)
            if len(ly) >= t.points_per_frame:
                pick = rng.choice(len(ly), t.points_per_frame,
                                       replace=False)
                px = lx[pick] + rng.normal(0, 25, t.points_per_frame)
                px = np.clip(px, 0, gt.shape[1]).astype(np.int64)
                pz = gt[ly[pick], lx[pick]] + rng.uniform(
                    0.0, 0.5, t.points_per_frame)
                points = np.stack(
                    [px.astype(np.float32),
                     points[:, 1],  # y kept erroneous, as in the reference
                     pz.astype(np.float32)], axis=1)

        # Geometric flips with point/box remap (rcnet_transforms.py:352-396;
        # enabled through rcnet_train.random_flip_type).
        H_img, W_img = gt.shape
        if ("horizontal" in t.random_flip_type
                and rng.random() < 0.5 * t.augmentation_probability):
            image = np.ascontiguousarray(image[:, ::-1])
            gt = np.ascontiguousarray(gt[:, ::-1])
            points[:, 0] = W_img - 1 - points[:, 0]
        if ("vertical" in t.random_flip_type
                and rng.random() < 0.5 * t.augmentation_probability):
            image = np.ascontiguousarray(image[::-1])
            gt = np.ascontiguousarray(gt[::-1])
            points[:, 1] = H_img - 1 - points[:, 1]

        # Shift to padded coordinates, build boxes and GT crops
        # (datasets.py:242-276).
        points[:, 0] += pad_x
        points[:, 1] += pad_y
        boxes = np.stack([points[:, 0] - pad_x, points[:, 1] - pad_y,
                          points[:, 0] + pad_x, points[:, 1] + pad_y],
                         axis=1).astype(np.float32)

        gt_pad = np.pad(gt, ((pad_y, pad_y), (pad_x, pad_x)),
                        mode="constant")
        crops = np.zeros((t.points_per_frame, ph, pw, 1), np.float32)
        for i in range(t.points_per_frame):
            y0 = int(points[i, 1]) - pad_y
            x0 = int(points[i, 0]) - pad_x
            crops[i, :, :, 0] = gt_pad[y0:y0 + ph, x0:x0 + pw]

        # Per-point noise on the coordinates fed to the point encoder
        # (rcnet_transforms.py:158-168 applies it to points_arr only -
        # boxes keep the un-noised geometry).  Disabled by default
        # (random_noise_type='none'), matching both reference configs.
        if (t.random_noise_type != "none" and t.random_noise_spread > 0
                and rng.random() < 0.5 * t.augmentation_probability):
            if t.random_noise_type == "gaussian":
                points = points + t.random_noise_spread * rng.standard_normal(
                    points.shape).astype(np.float32)
            elif t.random_noise_type == "uniform":
                points = points + t.random_noise_spread * (
                    rng.random(points.shape).astype(np.float32) - 0.5)
            else:
                raise ValueError(
                    f"unsupported noise type: {t.random_noise_type}")
            points = points.astype(np.float32)

        return {
            "image": image,
            "points": points,
            "boxes": boxes,
            "gt_crops": crops,
            "point_mask": np.ones(t.points_per_frame, np.float32),
        }


class RCNetInferenceDataset:
    """Per-frame loader for stage-2 inference (data/datasets.py:294-372):
    full padded frame plus the fixed-K point bucket."""

    def __init__(self, cfg: RidersConfig, records: Sequence[FrameRecord]):
        self.cfg = cfg
        self.records = list(records)

    def __len__(self) -> int:
        return len(self.records)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        rec = self.records[index]
        image = depthio.load_image(rec.image, normalize=True)
        image = _normalize_range(image, cfg.rcnet.normalized_image_range)
        from riders_tpu.pipelines.rcnet_inference import pad_image_for_patches
        image = pad_image_for_patches(image, cfg.rcnet.patch_size)
        points = depthio.load_radar_points(rec.radar)
        pts, mask = depthio.pad_points(points, cfg.dataset.max_points)
        return {"image": image.astype(np.float32), "points": pts,
                "point_mask": mask}


def _stack(samples: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


# Process-pool worker state: the dataset is shipped ONCE per worker via
# the pool initializer (not per task - a bound __getitem__ would pickle
# the dataset with every submit).  Module-level by necessity: worker
# processes look the function up by qualified name.
_POOL_DATASET = None


def _pool_init(dataset) -> None:
    global _POOL_DATASET
    _POOL_DATASET = dataset


def _pool_get(args):
    epoch, index = args
    ds = _POOL_DATASET
    if hasattr(ds, "set_epoch"):
        ds.set_epoch(epoch)      # cheap int set; keeps aug streams aligned
    return ds[index]


class BatchLoader:
    """Threaded batcher with device prefetch.

    Workers pull sample indices, run the dataset's __getitem__, and a
    collator thread stacks + device_puts finished batches; `prefetch`
    batches are staged ahead (the reference relies on DataLoader worker
    processes, train_zju.py:133-148).

    ``num_workers > 0`` switches sample decode to a PROCESS pool (torch
    DataLoader-style): PNG inflate is zlib inside the GIL, so thread
    decode tops out near single-core rate regardless of thread count
    (PERF.md "Host-fed serving"); serving at the device rate needs
    process parallelism.  The dataset is shipped once per worker via the
    pool initializer and must be picklable; per-epoch augmentation
    streams stay deterministic because every sample derives its rng from
    (seed, epoch, index), not worker identity."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_threads: int = 4, prefetch: int = 2, seed: int = 0,
                 drop_last: bool = True, device_put: bool = True,
                 sharding=None, num_workers: int = 0,
                 mp_context: str = "fork"):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_threads = max(1, num_threads)
        self.prefetch = prefetch
        self.rng = np.random.default_rng(seed)
        self.drop_last = drop_last
        self.device_put = device_put
        self.sharding = sharding
        self.num_workers = num_workers
        self.mp_context = mp_context
        self._epoch_count = 0
        self._pool = None

    def _process_pool(self):
        if self._pool is None:
            import multiprocessing
            from concurrent.futures import ProcessPoolExecutor
            self._pool = ProcessPoolExecutor(
                self.num_workers,
                mp_context=multiprocessing.get_context(self.mp_context),
                initializer=_pool_init, initargs=(self.dataset,))
        return self._pool

    def close(self) -> None:
        """Shut down the decode process pool (no-op for thread mode)."""
        if self._pool is not None:
            self._pool.shutdown()
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def epoch(self) -> Iterator[Dict[str, "jax.Array"]]:
        # Advance the dataset's augmentation stream once per epoch so the
        # per-(seed, epoch, index) sample rngs differ across epochs.
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(self._epoch_count)
        self._epoch_count += 1
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        n_batches = len(self)
        batches = [order[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(n_batches)]

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        epoch = self._epoch_count - 1

        def fetch_threaded(pool, idxs):
            return list(pool.map(self.dataset.__getitem__, idxs))

        def fetch_process(pool, idxs):
            return list(pool.map(_pool_get, [(epoch, int(i)) for i in idxs],
                                 chunksize=1))

        def producer():
            try:
                if self.num_workers > 0:
                    pool, fetch = self._process_pool(), fetch_process
                    run = _nullcontext(pool)
                else:
                    from concurrent.futures import ThreadPoolExecutor
                    pool = ThreadPoolExecutor(self.num_threads)
                    run, fetch = pool, fetch_threaded
                with run:
                    for idxs in batches:
                        if stop.is_set():
                            return
                        batch = _stack(fetch(pool, idxs))
                        if self.device_put:
                            batch = (jax.device_put(batch, self.sharding)
                                     if self.sharding is not None
                                     else jax.device_put(batch))
                        out_q.put(batch)
            finally:
                out_q.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    break
                yield batch
        finally:
            stop.set()
