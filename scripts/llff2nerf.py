#!/usr/bin/env python
"""Convert an LLFF dataset (poses_bounds.npy + images) to instant-ngp
`transforms_{train,val,test}.json`.

Capability parity with the reference's scripts/llff2nerf.py: the LLFF
[down right back] axis inversion, the colmap2nerf world normalization
(pose_utils.normalize_world), and the every-`hold`-th test split with vals
subsampled 1-in-10.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pose_utils import dump_poses_ply, normalize_world  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("path", help="dataset root containing poses_bounds.npy")
    p.add_argument("--images", default="images_8",
                   help="images subfolder (e.g. images_4)")
    p.add_argument("--downscale", type=float, default=8)
    p.add_argument("--hold", type=int, default=8,
                   help="hold out every k-th image for test")
    p.add_argument("--aabb_scale", type=int, default=2)
    p.add_argument("--dump_poses", default="",
                   help="write normalized camera frusta to this PLY path "
                        "(headless equivalent of the reference's "
                        "visualize_poses)")
    args = p.parse_args()

    pb = np.load(os.path.join(args.path, "poses_bounds.npy"))  # [N, 17]
    poses = pb[:, :15].reshape(-1, 3, 5)  # [N, 3, 5]
    N = poses.shape[0]
    H, W, fl = poses[0, :, 4]
    H, W = int(H // args.downscale), int(W // args.downscale)
    fl = fl / args.downscale

    # invert the LLFF pose packing (llff/poses/pose_utils.py:L51):
    # columns [down, right, back] -> [right, down, -back]
    mats = np.concatenate(
        [poses[..., 1:2], poses[..., 0:1], -poses[..., 2:3], poses[..., 3:4]],
        axis=-1,
    )  # [N, 3, 4]
    bottom = np.tile(np.array([0, 0, 0, 1.0]), (N, 1, 1))
    mats = np.concatenate([mats, bottom], axis=1)  # [N, 4, 4]
    mats = normalize_world(mats)
    if args.dump_poses:
        dump_poses_ply(mats, args.dump_poses)

    img_dir = os.path.join(args.path, args.images)
    names = sorted(
        f for f in os.listdir(img_dir)
        if f.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    assert len(names) == N, f"{len(names)} images vs {N} poses"

    all_ids = np.arange(N)
    test_ids = all_ids[:: args.hold]
    train_ids = np.array([i for i in all_ids if i not in test_ids])

    def frames_of(ids):
        return [
            {
                "file_path": os.path.join(args.images, names[i]),
                "transform_matrix": mats[i].tolist(),
            }
            for i in ids
        ]

    frames_test = frames_of(test_ids)
    for fname, frames in (
        ("transforms_train.json", frames_of(train_ids)),
        ("transforms_val.json", frames_test[::10]),
        ("transforms_test.json", frames_test),
    ):
        out = {
            "w": W, "h": H, "fl_x": float(fl), "fl_y": float(fl),
            "cx": W // 2, "cy": H // 2, "aabb_scale": args.aabb_scale,
            "frames": frames,
        }
        out_path = os.path.join(args.path, fname)
        with open(out_path, "w") as f:
            json.dump(out, f, indent=2)
        print(f"[llff2nerf] wrote {out_path} with {len(frames)} frames")


if __name__ == "__main__":
    main()
