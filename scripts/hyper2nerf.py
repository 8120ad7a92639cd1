#!/usr/bin/env python
"""Convert a HyperNeRF/Nerfies capture (dataset.json, scene.json, camera/*.json)
to D-NeRF-style `transforms_{split}.json` with time fields (capability parity
with scripts/hyper2nerf.py)."""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def load_camera(path):
    with open(path) as f:
        cam = json.load(f)
    R = np.array(cam["orientation"])  # world->cam rotation
    t = np.array(cam["position"])  # camera position in world
    c2w = np.eye(4)
    c2w[:3, :3] = R.T
    c2w[:3, 3] = t
    # nerfies cameras look down +z with y down; -> nerf convention
    c2w[:3, 1] *= -1
    c2w[:3, 2] *= -1
    return c2w, cam


def main():
    p = argparse.ArgumentParser()
    p.add_argument("path", help="capture root (dataset.json, camera/, rgb/)")
    p.add_argument("--downscale", type=int, default=2,
                   help="use rgb/{downscale}x images")
    args = p.parse_args()

    with open(os.path.join(args.path, "dataset.json")) as f:
        dataset = json.load(f)
    with open(os.path.join(args.path, "scene.json")) as f:
        scene = json.load(f)
    with open(os.path.join(args.path, "metadata.json")) as f:
        metadata = json.load(f)

    scale = scene.get("scale", 1.0)
    center = np.array(scene.get("center", [0, 0, 0]))

    all_ids = dataset["ids"]
    max_time = max(metadata[i]["time_id"] for i in all_ids) or 1

    splits = {
        "train": dataset.get("train_ids", all_ids),
        "val": dataset.get("val_ids", []),
    }
    for split, ids in splits.items():
        if not ids:
            continue
        frames = []
        fl = cx = cy = w = h = None
        for iid in ids:
            c2w, cam = load_camera(os.path.join(args.path, "camera", f"{iid}.json"))
            c2w[:3, 3] = (c2w[:3, 3] - center) * scale
            fl = cam["focal_length"] / args.downscale
            cx = cam["principal_point"][0] / args.downscale
            cy = cam["principal_point"][1] / args.downscale
            w = cam["image_size"][0] // args.downscale
            h = cam["image_size"][1] // args.downscale
            frames.append({
                "file_path": os.path.join("rgb", f"{args.downscale}x", f"{iid}.png"),
                "time": metadata[iid]["time_id"] / max_time,
                "transform_matrix": c2w.tolist(),
            })
        out = {
            "fl_x": fl, "fl_y": fl, "cx": cx, "cy": cy, "w": w, "h": h,
            "frames": frames,
        }
        out_path = os.path.join(args.path, f"transforms_{split}.json")
        with open(out_path, "w") as f:
            json.dump(out, f, indent=2)
        print(f"[hyper2nerf] wrote {out_path} with {len(frames)} frames")


if __name__ == "__main__":
    main()
