#!/usr/bin/env python
"""Convert an LLFF/Mip-NeRF-360 dataset (poses_bounds.npy + images) to
instant-ngp `transforms.json` (capability parity with scripts/llff2nerf.py)."""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("path", help="dataset root containing poses_bounds.npy")
    p.add_argument("--images", default="images", help="images subfolder")
    p.add_argument("--downscale", type=int, default=1)
    p.add_argument("--hold", type=int, default=8)
    p.add_argument("--aabb_scale", type=int, default=4)
    args = p.parse_args()

    pb = np.load(os.path.join(args.path, "poses_bounds.npy"))  # [N, 17]
    poses = pb[:, :15].reshape(-1, 3, 5)  # [N, 3, 5]
    hwf = poses[0, :, 4]
    H, W, focal = hwf / args.downscale if args.downscale > 1 else hwf
    # llff [down right back] -> nerf [right up back]
    mats = np.concatenate(
        [poses[:, :, 1:2], -poses[:, :, 0:1], poses[:, :, 2:3], poses[:, :, 3:4]],
        axis=-1,
    )  # [N, 3, 4]

    img_dir = os.path.join(args.path, args.images)
    names = sorted(
        f for f in os.listdir(img_dir)
        if f.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    assert len(names) == len(mats), f"{len(names)} images vs {len(mats)} poses"

    # recenter + scale
    centers = mats[:, :, 3]
    center = centers.mean(axis=0)
    mats[:, :, 3] -= center
    scale = 4.0 / max(np.linalg.norm(mats[:, :, 3], axis=-1).mean(), 1e-6)
    mats[:, :, 3] *= scale

    bottom = np.array([[0, 0, 0, 1.0]])
    out = {
        "fl_x": float(focal), "fl_y": float(focal),
        "cx": float(W) / 2, "cy": float(H) / 2,
        "w": float(W), "h": float(H),
        "aabb_scale": args.aabb_scale,
        "frames": [
            {
                "file_path": os.path.join(args.images, name),
                "transform_matrix": np.concatenate([m, bottom]).tolist(),
            }
            for name, m in zip(names, mats)
        ],
    }
    out_path = os.path.join(args.path, "transforms.json")
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"[llff2nerf] wrote {out_path} with {len(names)} frames")


if __name__ == "__main__":
    main()
