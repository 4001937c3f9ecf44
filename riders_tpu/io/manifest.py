"""Dataset manifest: scene walking and aligned path lists.

Replaces the path-assembly preludes of the reference drivers
(train_zju.py:87-128, val_zju.py:48-100, RCNet/run_rcnet_zju.py:62-84) with
one manifest builder for the README.md:16-31 directory layout:

    <root>/<scene>/thermal_undistort/*.png     thermal image
    <root>/<scene>/<mono_pred_dir>/*.png       monocular depth prior
    <root>/<scene>/radar_png/*.png|*.npy       sparse radar depth / points
    <root>/<scene>/lidar_png/*.png             sparse lidar GT
    <root>/<scene>/lidar_png_int/*.png         Delaunay-interpolated lidar GT
    <root>/output/rcnet_<thr>/<scene>/depth_predicted/*.png   stage-2 output
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Sequence

from riders_tpu.core.config import DatasetConfig


@dataclasses.dataclass
class FrameRecord:
    """Paths for one frame; missing modalities are None."""

    scene: str
    frame_id: str
    image: str
    mono_pred: Optional[str] = None
    radar: Optional[str] = None
    gt_interp: Optional[str] = None
    gt_sparse: Optional[str] = None
    rcnet: Optional[str] = None


def _listdir_sorted(path: str) -> List[str]:
    return sorted(os.listdir(path)) if os.path.isdir(path) else []


def build_manifest(cfg: DatasetConfig,
                   scenes: Sequence[str],
                   rcnet_interp: Optional[str] = None,
                   require_all: bool = True) -> List[FrameRecord]:
    """Build aligned per-frame records for the given scenes.

    Alignment follows the reference: per-scene sorted directory listings
    zipped positionally, with an assert that all modalities have equal
    counts (train_zju.py:120-126, val_zju.py:96-99).
    """
    records: List[FrameRecord] = []
    for scene in scenes:
        scene_root = os.path.join(cfg.root, scene)
        images = _listdir_sorted(os.path.join(scene_root, cfg.image_dir))
        monos = _listdir_sorted(os.path.join(scene_root, cfg.mono_pred_dir))
        radars = _listdir_sorted(os.path.join(scene_root, cfg.radar_dir))
        gts = _listdir_sorted(os.path.join(scene_root, cfg.gt_interp_dir))
        sparse_gts = _listdir_sorted(os.path.join(scene_root, cfg.gt_sparse_dir))

        rcnet_dir = None
        rcnets: List[str] = []
        if rcnet_interp:
            rcnet_dir = os.path.join(
                cfg.root, cfg.rcnet_output_dir, rcnet_interp, scene,
                "depth_predicted")
            rcnets = _listdir_sorted(rcnet_dir)

        if require_all:
            counts = {"image": len(images), "mono_pred": len(monos),
                      "radar": len(radars), "gt_interp": len(gts),
                      "gt_sparse": len(sparse_gts)}
            if rcnet_interp:
                counts["rcnet"] = len(rcnets)
            if len(set(counts.values())) != 1:
                raise ValueError(
                    f"Modality count mismatch in scene {scene}: {counts}")

        if not images:
            raise ValueError(
                f"Scene {scene!r} has no frames under "
                f"{os.path.join(scene_root, cfg.image_dir)!r} - wrong root "
                "or scene name?")
        for i, image in enumerate(images):
            records.append(FrameRecord(
                scene=scene,
                frame_id=os.path.splitext(image)[0],
                image=os.path.join(scene_root, cfg.image_dir, image),
                mono_pred=(os.path.join(scene_root, cfg.mono_pred_dir, monos[i])
                           if i < len(monos) else None),
                radar=(os.path.join(scene_root, cfg.radar_dir, radars[i])
                       if i < len(radars) else None),
                gt_interp=(os.path.join(scene_root, cfg.gt_interp_dir, gts[i])
                           if i < len(gts) else None),
                gt_sparse=(os.path.join(scene_root, cfg.gt_sparse_dir,
                                        sparse_gts[i])
                           if i < len(sparse_gts) else None),
                rcnet=(os.path.join(rcnet_dir, rcnets[i])
                       if rcnet_dir and i < len(rcnets) else None),
            ))
    return records


def swap_rcnet_threshold(record: FrameRecord, threshold: float) -> str:
    """Point a record's rcnet path at a different response threshold
    (UTV_dataset.py:183-186)."""
    assert record.rcnet is not None
    cur = record.rcnet.split("rcnet_")[-1][:3]
    return record.rcnet.replace(f"rcnet_{cur}", f"rcnet_{threshold}")
