"""Convert a KITTI depth-completion tree into this framework's dataset layout.

KITTI-DC (val_selection_cropped or the benchmark split) ships:
    image/            RGB PNGs
    velodyne_raw/     sparse LiDAR depth as uint16 PNGs (depth = v/256 m)
    groundtruth/      semi-dense GT, same encoding (optional)

This framework's layout (reference utils.py:18-24 conventions):
    <out>/<scene>/image/*.png     RGB
    <out>/<scene>/sparse/*.png    8-bit channel-0 depth: v = d/max_depth*255
    <out>/<scene>/groundtruth/*.png   pass-through uint16 (evaluated with
                                      `dct-analyze --gt-dir groundtruth
                                       --gt-format png16`)

Note the 8-bit sparse encoding quantizes to max_depth/255 (≈0.47 m at 120 m)
— the reference's own input format (to_depth, reference utils.py:1137-1158).
For benchmark-grade anchors use --sparse-format png16-passthrough, which
keeps the uint16 PNGs and requires loading with max-sparse-depth=256-scale
tooling.

Usage:
    python scripts/prepare_kitti_dc.py KITTI_ROOT OUT_ROOT [--max-depth 120]
"""

from __future__ import annotations

import argparse
import shutil
import sys
from pathlib import Path

import cv2
import numpy as np


def convert(
    kitti_root: Path, out_root: Path, max_depth: float, copy_gt: bool
) -> int:
    img_dir = kitti_root / "image"
    sparse_dir = kitti_root / "velodyne_raw"
    gt_dir = kitti_root / "groundtruth"
    if not img_dir.is_dir() or not sparse_dir.is_dir():
        print(f"expected {img_dir} and {sparse_dir}", file=sys.stderr)
        return 1
    scene = out_root / kitti_root.name
    (scene / "image").mkdir(parents=True, exist_ok=True)
    (scene / "sparse").mkdir(parents=True, exist_ok=True)
    n = 0
    for img_path in sorted(img_dir.rglob("*.png")):
        rel = img_path.relative_to(img_dir)
        sp = sparse_dir / rel
        if not sp.exists():
            continue
        shutil.copyfile(img_path, scene / "image" / rel.name)
        raw = cv2.imread(str(sp), cv2.IMREAD_UNCHANGED).astype(np.float32) / 256.0
        encoded = np.clip(raw / max_depth * 255.0, 0, 255).astype(np.uint8)
        rgb = np.stack([encoded, encoded, encoded], axis=-1)
        cv2.imwrite(str(scene / "sparse" / rel.name), rgb)
        if copy_gt and (gt_dir / rel).exists():
            (scene / "groundtruth").mkdir(exist_ok=True)
            shutil.copyfile(gt_dir / rel, scene / "groundtruth" / rel.name)
        n += 1
    print(f"converted {n} frames into {scene}")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("kitti_root", type=Path)
    ap.add_argument("out_root", type=Path)
    ap.add_argument("--max-depth", type=float, default=120.0)
    ap.add_argument("--no-gt", action="store_true")
    args = ap.parse_args()
    return convert(args.kitti_root, args.out_root, args.max_depth, not args.no_gt)


if __name__ == "__main__":
    sys.exit(main())
