"""SDF workload end-to-end (CPU): native SDF dataset on a generated sphere
mesh, training fits it, mesh export roundtrips."""

import numpy as np

from tngp.data.sdf import SDFDataset
from tngp.models import SDFNetwork
from tngp.native import MeshSDF, marching_tetrahedra
from tngp.train.sdf_trainer import SDFTrainer
from tngp.utils.config import TrainConfig


def sphere_mesh(n=32, r=0.6):
    g = np.linspace(-1, 1, n, dtype=np.float32)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    field = r - np.sqrt(X**2 + Y**2 + Z**2)
    verts, faces = marching_tetrahedra(field, 0.0)
    return verts / (n - 1) * 2 - 1, faces


def test_sdf_dataset_labels():
    verts, faces = sphere_mesh()
    ds = SDFDataset(vertices=verts, faces=faces, num_samples=2048, size=2)
    pts, sdfs = ds.sample(0)
    assert pts.shape == (2048, 3) and sdfs.shape == (2048, 1)
    # first half: pure surface, label 0
    assert np.all(sdfs[:1024] == 0)
    # normalization rescales the sphere: radius = 2*0.6/ (sqrt(3)*1.2) *0.95
    rad = np.linalg.norm(ds.vertices, axis=1).mean()
    # uniform tail: positive outside convention
    uni = pts[2048 * 7 // 8 :]
    lab = sdfs[2048 * 7 // 8 :, 0]
    outside = np.linalg.norm(uni, axis=1) > rad
    acc = ((lab > 0) == outside).mean()
    assert acc > 0.97, acc


def test_sdf_training_and_mesh(tmp_path):
    verts, faces = sphere_mesh()
    ds = SDFDataset(vertices=verts, faces=faces, num_samples=8192, size=16)
    model = SDFNetwork(num_layers=2, hidden_dim=32)
    tc = TrainConfig(name="sdf", workspace=str(tmp_path), eval_interval=10,
                     use_checkpoint="scratch")
    tr = SDFTrainer(model, ds, tc, lr=2e-3)
    l0 = tr.train_one_epoch()
    for _ in range(7):
        tr.epoch += 1
        l1 = tr.train_one_epoch()
    assert l1 < l0, (l0, l1)

    path = tr.save_mesh(str(tmp_path / "mesh.obj"), resolution=48)
    from tngp.native import load_obj

    v2, f2 = load_obj(path)
    assert len(v2) > 100 and len(f2) > 100
    rad = np.linalg.norm(ds.vertices, axis=1).mean()
    r2 = np.linalg.norm(v2, axis=1)
    # level-set radius within discretization+training tolerance of the target
    assert abs(np.median(r2) - rad) < 0.12, (np.median(r2), rad)
