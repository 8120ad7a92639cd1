#!/usr/bin/env python
"""Convert a COLMAP text export (cameras.txt / images.txt) to instant-ngp
`transforms.json`.

Capability parity with the reference's scripts/colmap2nerf.py: optional video
-> frames via ffmpeg, optional colmap invocation, sharpness scoring, scene
recentering on the mutual ray focus, scale normalization, optional `time`
field for dynamic scenes.  Re-implemented from the COLMAP text-format spec.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pose_utils import (  # noqa: E402
    closest_point_2_lines,
    dump_poses_ply,
    rotation_between,
)


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--video", default="", help="input video (frames extracted via ffmpeg)")
    p.add_argument("--time_slice", default="",
                   help="'t1,t2' seconds: only extract video frames between "
                        "t1 and t2 (reference colmap2nerf.py:35)")
    p.add_argument("--images", default="images", help="images folder")
    p.add_argument("--run_colmap", action="store_true")
    p.add_argument("--estimate_affine_shape", action="store_true",
                   help="enable COLMAP SiftExtraction.estimate_affine_shape "
                        "+ domain_size_pooling (CPU-only, better features; "
                        "reference colmap2nerf.py:31)")
    p.add_argument("--dump_poses", default="",
                   help="write final camera frusta to this PLY path "
                        "(headless equivalent of the reference's "
                        "visualize_poses)")
    p.add_argument("--keep_colmap_coords", action="store_true",
                   help="skip the up-vector reorientation / recentering / "
                        "rescale (write raw COLMAP world coordinates)")
    p.add_argument("--dynamic", action="store_true",
                   help="write a time field from the frame index")
    p.add_argument("--hold", type=int, default=8, help="val holdout every k images")
    p.add_argument("--video_fps", type=float, default=3)
    p.add_argument("--colmap_matcher", default="exhaustive",
                   choices=["exhaustive", "sequential", "spatial", "transitive", "vocab_tree"])
    p.add_argument("--colmap_text", default="colmap_text")
    p.add_argument("--colmap_db", default="colmap.db")
    p.add_argument("--aabb_scale", type=int, default=2)
    p.add_argument("--skip_early", type=int, default=0)
    p.add_argument("--out", default="transforms.json")
    return p.parse_args()


def qvec2rotmat(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def sharpness(path: str) -> float:
    import cv2

    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if img is None:
        return 0.0
    return float(cv2.Laplacian(img, cv2.CV_64F).var())


def extract_video(video: str, out_dir: str, fps: float, time_slice: str = ""):
    os.makedirs(out_dir, exist_ok=True)
    vf = f"fps={fps}"
    if time_slice:
        t1, t2 = time_slice.split(",")
        vf += f",select='between(t\\,{t1}\\,{t2})'"
    subprocess.run(
        ["ffmpeg", "-y", "-i", video, "-qscale:v", "1", "-qmin", "1",
         "-vf", vf, os.path.join(out_dir, "%04d.jpg")],
        check=True,
    )


def run_colmap(args):
    db, images, text = args.colmap_db, args.images, args.colmap_text
    eas = "1" if args.estimate_affine_shape else "0"
    subprocess.run(["colmap", "feature_extractor", "--database_path", db,
                    "--image_path", images, "--ImageReader.camera_model", "OPENCV",
                    "--SiftExtraction.estimate_affine_shape", eas,
                    "--SiftExtraction.domain_size_pooling", eas,
                    "--ImageReader.single_camera", "1"], check=True)
    subprocess.run(["colmap", f"{args.colmap_matcher}_matcher",
                    "--database_path", db], check=True)
    os.makedirs("colmap_sparse", exist_ok=True)
    subprocess.run(["colmap", "mapper", "--database_path", db,
                    "--image_path", images, "--output_path", "colmap_sparse"], check=True)
    os.makedirs(text, exist_ok=True)
    subprocess.run(["colmap", "model_converter", "--input_path",
                    "colmap_sparse/0", "--output_path", text,
                    "--output_type", "TXT"], check=True)


def read_cameras(path: str):
    cams = {}
    with open(path) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            t = line.split()
            cam_id, model, w, h = int(t[0]), t[1], float(t[2]), float(t[3])
            params = [float(x) for x in t[4:]]
            cam = {"w": w, "h": h, "k1": 0.0, "k2": 0.0, "p1": 0.0, "p2": 0.0}
            if model in ("SIMPLE_PINHOLE", "SIMPLE_RADIAL", "RADIAL"):
                cam["fl_x"] = cam["fl_y"] = params[0]
                cam["cx"], cam["cy"] = params[1], params[2]
                if model != "SIMPLE_PINHOLE":
                    cam["k1"] = params[3]
                if model == "RADIAL":
                    cam["k2"] = params[4]
            elif model in ("PINHOLE", "OPENCV"):
                cam["fl_x"], cam["fl_y"] = params[0], params[1]
                cam["cx"], cam["cy"] = params[2], params[3]
                if model == "OPENCV":
                    cam["k1"], cam["k2"], cam["p1"], cam["p2"] = params[4:8]
            else:
                raise ValueError(f"unsupported camera model {model}")
            cams[cam_id] = cam
    return cams


def read_images(path: str):
    """IMAGE_ID QW QX QY QZ TX TY TZ CAMERA_ID NAME, alternating with a
    POINTS2D line (which may be completely empty for zero-point images — so
    alternate with a toggle rather than slicing filtered lines)."""
    out = []
    expecting_image = True
    with open(path) as f:
        for line in f:
            if line.startswith("#"):
                continue
            if expecting_image:
                if not line.strip():
                    continue  # leading blank before any image entry
                t = line.split()
                out.append({
                    "qvec": np.array([float(x) for x in t[1:5]]),
                    "tvec": np.array([float(x) for x in t[5:8]]),
                    "camera_id": int(t[8]),
                    "name": " ".join(t[9:]),
                })
                expecting_image = False
            else:
                expecting_image = True  # consume the (possibly empty) points line
    return out


def main():
    args = parse_args()
    if args.video:
        extract_video(args.video, args.images, args.video_fps, args.time_slice)
    if args.run_colmap:
        run_colmap(args)

    cams = read_cameras(os.path.join(args.colmap_text, "cameras.txt"))
    images = read_images(os.path.join(args.colmap_text, "images.txt"))
    images.sort(key=lambda im: im["name"])
    images = images[args.skip_early:]

    cam0 = cams[images[0]["camera_id"]]
    angle_x = 2 * math.atan(cam0["w"] / (2 * cam0["fl_x"]))
    out = {
        "camera_angle_x": angle_x,
        "fl_x": cam0["fl_x"], "fl_y": cam0["fl_y"],
        "cx": cam0["cx"], "cy": cam0["cy"],
        "w": cam0["w"], "h": cam0["h"],
        "k1": cam0["k1"], "k2": cam0["k2"], "p1": cam0["p1"], "p2": cam0["p2"],
        "aabb_scale": args.aabb_scale,
        "frames": [],
    }

    bottom = np.array([0, 0, 0, 1.0]).reshape(1, 4)
    up_accum = np.zeros(3)
    for i, im in enumerate(images):
        R = qvec2rotmat(im["qvec"])
        t = im["tvec"].reshape(3, 1)
        w2c = np.concatenate([np.concatenate([R, t], axis=1), bottom], axis=0)
        c2w = np.linalg.inv(w2c)
        if not args.keep_colmap_coords:
            # colmap -> nerf camera convention: flip camera y/z, swap world
            # x/y, flip world z (so gravity points along -z before the
            # up-alignment below)
            c2w[0:3, 1] *= -1
            c2w[0:3, 2] *= -1
            c2w = c2w[[1, 0, 2, 3], :]
            c2w[2, :] *= -1
            up_accum += c2w[0:3, 1]
        fpath = os.path.join(args.images, im["name"])
        frame = {
            "file_path": fpath,
            "sharpness": sharpness(fpath),
            "transform_matrix": c2w.tolist(),
        }
        if args.dynamic:
            frame["time"] = i / max(len(images) - 1, 1)
        out["frames"].append(frame)

    frames = out["frames"]
    if not args.keep_colmap_coords:
        # reorient the world so the mean camera up-vector is +z
        up = up_accum / (np.linalg.norm(up_accum) + 1e-12)
        Rup = np.pad(rotation_between(up, np.array([0.0, 0.0, 1.0])), [(0, 1), (0, 1)])
        Rup[3, 3] = 1.0
        for f in frames:
            f["transform_matrix"] = Rup @ np.array(f["transform_matrix"])

        # recenter on the mutual focus point of all camera rays
        totw, totp = 0.0, np.zeros(3)
        mats = [np.array(f["transform_matrix"]) for f in frames]
        for f in mats:
            for g in mats:
                p, w = closest_point_2_lines(f[:3, 3], f[:3, 2], g[:3, 3], g[:3, 2])
                if w > 0.00001:
                    totp += p * w
                    totw += w
        if totw > 0:
            totp /= totw
        for f, m in zip(frames, mats):
            m[:3, 3] -= totp
            f["transform_matrix"] = m

        avglen = np.mean([np.linalg.norm(np.array(f["transform_matrix"])[:3, 3])
                          for f in frames])
        scale = 4.0 / max(avglen, 1e-6)
        for f in frames:
            m = np.array(f["transform_matrix"])
            m[:3, 3] *= scale
            f["transform_matrix"] = m.tolist()
    else:
        for f in frames:
            f["transform_matrix"] = np.array(f["transform_matrix"]).tolist()

    if args.dump_poses:
        dump_poses_ply(
            np.stack([np.array(f["transform_matrix"]) for f in frames]),
            args.dump_poses,
        )

    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"[colmap2nerf] wrote {args.out} with {len(frames)} frames")


if __name__ == "__main__":
    main()
