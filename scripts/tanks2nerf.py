#!/usr/bin/env python
"""Convert a Tanks&Temples scene (NSVF layout: pose/*.txt 4x4 c2w matrices,
intrinsics.txt, rgb/*.png) to instant-ngp `transforms_{train,val,test}.json`.

Capability parity with the reference's scripts/tanks2nerf.py: the colmap2nerf
world normalization (pose_utils.normalize_world) and the NSVF filename-prefix
splits (0_=train, 1_=val, 2_=test; a missing test split falls back to val).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pose_utils import normalize_world  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("path", help="scene root (contains pose/, rgb/, intrinsics.txt)")
    p.add_argument("--aabb_scale", type=int, default=2)
    args = p.parse_args()

    intr = np.loadtxt(os.path.join(args.path, "intrinsics.txt"))
    if intr.ndim == 2:  # 4x4 matrix form
        fl_x, fl_y = intr[0, 0], intr[1, 1]
        cx, cy = intr[0, 2], intr[1, 2]
    else:  # fx cx cy ... scalar form
        fl_x = fl_y = intr[0]
        cx, cy = intr[1], intr[2]

    pose_files = sorted(os.listdir(os.path.join(args.path, "pose")))
    img_files = sorted(os.listdir(os.path.join(args.path, "rgb")))
    assert len(pose_files) == len(img_files), (len(pose_files), len(img_files))

    import cv2

    first = cv2.imread(os.path.join(args.path, "rgb", img_files[0]))
    H, W = first.shape[:2] if first is not None else (1080, 1920)

    poses = np.stack(
        [np.loadtxt(os.path.join(args.path, "pose", f)).reshape(4, 4)
         for f in pose_files]
    )
    poses = normalize_world(poses)

    def split_frames(prefix):
        return [
            {"file_path": os.path.join("rgb", img),
             "transform_matrix": poses[i].tolist()}
            for i, (pf, img) in enumerate(zip(pose_files, img_files))
            if pf.startswith(prefix)
        ]

    for split, prefix in (("train", "0_"), ("val", "1_"), ("test", "2_")):
        frames = split_frames(prefix)
        if not frames:  # no test data: reuse val as test (reference behavior)
            frames = split_frames("1_")
        out = {
            "w": W, "h": H, "fl_x": float(fl_x), "fl_y": float(fl_y),
            "cx": float(cx), "cy": float(cy), "aabb_scale": args.aabb_scale,
            "frames": frames,
        }
        out_path = os.path.join(args.path, f"transforms_{split}.json")
        with open(out_path, "w") as f:
            json.dump(out, f, indent=2)
        print(f"[tanks2nerf] wrote {out_path} with {len(frames)} frames")


if __name__ == "__main__":
    main()
