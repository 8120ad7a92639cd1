"""Dataset conversion scripts end-to-end on synthesized captures: COLMAP text
export, LLFF poses_bounds, NSVF Tanks&Temples layout, HyperNeRF capture.
Checks split files, frame counts, and the shared world normalization
(mean camera-up -> +z, average radius 4)."""

import json
import os
import subprocess
import sys

import numpy as np

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "scripts")


def run_script(name, args, cwd):
    return subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, name), *args],
        cwd=cwd, capture_output=True, text=True, timeout=300,
    )


def orbit_c2w(n, radius=3.0):
    """n inward-looking cameras on a circle (y-up convention arbitrary)."""
    out = []
    for i in range(n):
        th = 2 * np.pi * i / n
        c = radius * np.array([np.sin(th), 0.4, np.cos(th)])
        fwd = -c / np.linalg.norm(c)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        up2 = np.cross(right, fwd)
        m = np.eye(4)
        m[:3, :3] = np.stack([right, up2, -fwd], axis=-1)  # cam looks down -z... use +z-back
        m[:3, 3] = c
        out.append(m)
    return out


def check_normalized(mats):
    mats = np.asarray(mats)
    up = mats[:, :3, 1].sum(0)
    up /= np.linalg.norm(up)
    assert up[2] > 0.99, f"mean up not aligned to +z: {up}"
    avg_r = np.linalg.norm(mats[:, :3, 3], axis=-1).mean()
    assert abs(avg_r - 4.0) < 0.5, f"avg radius {avg_r}"


def test_colmap2nerf(tmp_path):
    text = tmp_path / "colmap_text"
    text.mkdir()
    imgs = tmp_path / "images"
    imgs.mkdir()
    (text / "cameras.txt").write_text(
        "# cameras\n1 PINHOLE 640 480 500 500 320 240\n"
    )
    lines = []
    rng = np.random.default_rng(0)
    for i, c2w in enumerate(orbit_c2w(8)):
        w2c = np.linalg.inv(c2w)
        R = w2c[:3, :3]
        t = w2c[:3, 3]
        # rotmat -> qvec (w, x, y, z)
        w = np.sqrt(max(1 + R[0, 0] + R[1, 1] + R[2, 2], 1e-9)) / 2
        x = (R[2, 1] - R[1, 2]) / (4 * w)
        y = (R[0, 2] - R[2, 0]) / (4 * w)
        z = (R[1, 0] - R[0, 1]) / (4 * w)
        name = f"im_{i:03d}.png"
        (imgs / name).write_bytes(b"")
        lines.append(
            f"{i+1} {w} {x} {y} {z} {t[0]} {t[1]} {t[2]} 1 {name}\n\n"
        )
    (text / "images.txt").write_text("# imgs\n" + "".join(lines))

    r = run_script("colmap2nerf.py", ["--dynamic"], str(tmp_path))
    assert r.returncode == 0, r.stderr
    out = json.loads((tmp_path / "transforms.json").read_text())
    assert len(out["frames"]) == 8
    assert out["fl_x"] == 500 and out["w"] == 640
    assert all("time" in f for f in out["frames"])
    assert out["frames"][-1]["time"] == 1.0
    check_normalized([f["transform_matrix"] for f in out["frames"]])


def test_llff2nerf(tmp_path):
    n = 12
    H, W, fl = 480.0, 640.0, 500.0
    pb = []
    for c2w in orbit_c2w(n):
        # LLFF packing: columns [down, right, back] + hwf column
        m = c2w[:3].copy()
        llff = np.concatenate(
            [m[:, 1:2], m[:, 0:1], -m[:, 2:3], m[:, 3:4],
             np.array([[H], [W], [fl]])], axis=1)
        pb.append(np.concatenate([llff.reshape(-1), [2.0, 6.0]]))
    np.save(tmp_path / "poses_bounds.npy", np.stack(pb))
    imdir = tmp_path / "images_8"
    imdir.mkdir()
    for i in range(n):
        (imdir / f"{i:03d}.png").write_bytes(b"")

    r = run_script("llff2nerf.py", [str(tmp_path), "--hold", "4"], str(tmp_path))
    assert r.returncode == 0, r.stderr
    tr = json.loads((tmp_path / "transforms_train.json").read_text())
    te = json.loads((tmp_path / "transforms_test.json").read_text())
    assert len(te["frames"]) == 3  # every 4th of 12
    assert len(tr["frames"]) == 9
    assert (tmp_path / "transforms_val.json").exists()
    check_normalized([f["transform_matrix"]
                      for f in tr["frames"] + te["frames"]])


def test_tanks2nerf(tmp_path):
    (tmp_path / "pose").mkdir()
    (tmp_path / "rgb").mkdir()
    np.savetxt(tmp_path / "intrinsics.txt",
               np.array([[500, 0, 320, 0], [0, 500, 240, 0],
                         [0, 0, 1, 0], [0, 0, 0, 1.0]]))
    mats = orbit_c2w(6)
    for i, m in enumerate(mats):
        prefix = "0_" if i < 4 else "1_"
        np.savetxt(tmp_path / "pose" / f"{prefix}{i:04d}.txt", m)
        (tmp_path / "rgb" / f"{prefix}{i:04d}.png").write_bytes(b"")

    r = run_script("tanks2nerf.py", [str(tmp_path)], str(tmp_path))
    assert r.returncode == 0, r.stderr
    tr = json.loads((tmp_path / "transforms_train.json").read_text())
    va = json.loads((tmp_path / "transforms_val.json").read_text())
    te = json.loads((tmp_path / "transforms_test.json").read_text())
    assert len(tr["frames"]) == 4 and len(va["frames"]) == 2
    assert len(te["frames"]) == 2  # no 2_ files: falls back to val
    assert tr["fl_x"] == 500 and tr["cx"] == 320


def test_hyper2nerf(tmp_path):
    n = 12
    names = [f"f{i:03d}" for i in range(n)]
    (tmp_path / "camera").mkdir()
    mats = orbit_c2w(n)
    for name, m in zip(names, mats):
        cam = {
            "orientation": np.linalg.inv(m)[:3, :3].tolist(),
            "position": m[:3, 3].tolist(),
            "focal_length": 500.0,
            "principal_point": [320.0, 240.0],
            "image_size": [640, 480],
        }
        (tmp_path / "camera" / f"{name}.json").write_text(json.dumps(cam))
    (tmp_path / "dataset.json").write_text(json.dumps(
        {"ids": names, "val_ids": [], "train_ids": names}))
    (tmp_path / "scene.json").write_text(json.dumps(
        {"scale": 1.0, "center": [0, 0, 0]}))
    (tmp_path / "metadata.json").write_text(json.dumps(
        {name: {"time_id": i} for i, name in enumerate(names)}))

    ply = tmp_path / "poses.ply"
    r = run_script("hyper2nerf.py",
                   [str(tmp_path), "--interval", "4",
                    "--dump_poses", str(ply)],
                   str(tmp_path))
    assert r.returncode == 0, r.stderr
    tr = json.loads((tmp_path / "transforms_train.json").read_text())
    va = json.loads((tmp_path / "transforms_val.json").read_text())
    te = json.loads((tmp_path / "transforms_test.json").read_text())
    assert len(tr["frames"]) == 3  # 12 / interval 4
    assert len(va["frames"]) == 1  # midpoints [::10]
    assert len(te["frames"]) == 2  # all midpoints (ref writes full vals)
    assert all(0.0 <= f["time"] <= 1.0 for f in tr["frames"])
    assert tr["fl_x"] == 250.0  # 500 / downscale 2

    # pose dump: valid PLY with 9 segments per camera + 12 box edges
    header = ply.read_text().splitlines()
    assert header[0] == "ply"
    n_edge = next(int(l.split()[-1]) for l in header
                  if l.startswith("element edge"))
    assert n_edge == 12 + 9 * 12
