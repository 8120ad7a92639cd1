#!/usr/bin/env python
"""Convert a HyperNeRF/Nerfies capture (dataset.json, scene.json, camera/*.json)
to D-NeRF-style `transforms_{train,val,test}.json` with time fields.

Capability parity with the reference's scripts/hyper2nerf.py: vrig captures
use the dataset's own train/val ids; interp captures (no val_ids) are split
every `--interval` frames with vals at the midpoints; poses get the same
world normalization as colmap2nerf (axis permutation, mean-up alignment to
+z, recenter on the mutual ray focus, 4/avg-radius rescale); val frames are
subsampled 1-in-10.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

import sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pose_utils import dump_poses_ply, normalize_world  # noqa: E402


def load_camera(path):
    with open(path) as f:
        cam = json.load(f)
    R = np.array(cam["orientation"])  # world->cam rotation
    t = np.array(cam["position"])  # camera position in world
    c2w = np.eye(4)
    c2w[:3, :3] = R.T
    c2w[:3, 3] = t
    return c2w, cam


def main():
    p = argparse.ArgumentParser()
    p.add_argument("path", help="capture root (dataset.json, camera/, rgb/)")
    p.add_argument("--downscale", type=int, default=2,
                   help="use rgb/{downscale}x images (2/4/8/16)")
    p.add_argument("--interval", type=int, default=4,
                   help="interp-capture train split stride (no val_ids case); "
                        "vals are the midpoints between train frames")
    p.add_argument("--dump_poses", default="",
                   help="write normalized camera frusta to this PLY path "
                        "(headless equivalent of the reference's "
                        "visualize_poses)")
    args = p.parse_args()

    with open(os.path.join(args.path, "dataset.json")) as f:
        dataset = json.load(f)
    with open(os.path.join(args.path, "scene.json")) as f:
        scene = json.load(f)
    with open(os.path.join(args.path, "metadata.json")) as f:
        metadata = json.load(f)

    names = dataset["ids"]
    val_names = dataset.get("val_ids", [])
    if len(val_names) > 0:  # vrig capture: the dataset defines the split
        train_names = dataset["train_ids"]
        train_ids = [i for i, n in enumerate(names) if n in train_names]
        val_ids = [i for i, n in enumerate(names) if n in val_names]
    else:  # interp capture: stride split, vals between train frames
        all_ids = np.arange(len(names))
        train_ids = all_ids[:: args.interval]
        val_ids = ((train_ids[:-1] + train_ids[1:]) // 2).tolist()
        train_ids = train_ids.tolist()

    scale = scene.get("scale", 1.0)
    center = np.array(scene.get("center", [0, 0, 0]))
    max_time = max(metadata[n]["time_id"] for n in names) or 1

    poses, times, files = [], [], []
    fl = cx = cy = w = h = None
    for name in names:
        c2w, cam = load_camera(os.path.join(args.path, "camera", f"{name}.json"))
        c2w[:3, 3] = (c2w[:3, 3] - center) * scale
        poses.append(c2w)
        times.append(metadata[name]["time_id"] / max_time)
        files.append(os.path.join("rgb", f"{args.downscale}x", f"{name}.png"))
        fl = cam["focal_length"] / args.downscale
        cx = cam["principal_point"][0] / args.downscale
        cy = cam["principal_point"][1] / args.downscale
        w = cam["image_size"][0] // args.downscale
        h = cam["image_size"][1] // args.downscale

    poses = normalize_world(np.stack(poses))
    if args.dump_poses:
        dump_poses_ply(poses, args.dump_poses)

    def frames_of(ids):
        return [
            {
                "file_path": files[i],
                "time": float(times[i]),
                "transform_matrix": poses[i].tolist(),
            }
            for i in ids
        ]

    # reference split files (hyper2nerf.py:222-224): val is the 1-in-10
    # subsample of the held-out frames, test is all of them
    for split, frames in (
        ("train", frames_of(train_ids)),
        ("val", frames_of(val_ids)[::10]),
        ("test", frames_of(val_ids)),
    ):
        out = {"fl_x": fl, "fl_y": fl, "cx": cx, "cy": cy, "w": w, "h": h,
               "frames": frames}
        out_path = os.path.join(args.path, f"transforms_{split}.json")
        with open(out_path, "w") as f:
            json.dump(out, f, indent=2)
        print(f"[hyper2nerf] wrote {out_path} with {len(frames)} frames")


if __name__ == "__main__":
    main()
