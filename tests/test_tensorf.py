"""TensoRF: grid_sample parity vs torch, VM/CP model smoke + render + upsample."""

import jax
import jax.numpy as jnp
import numpy as np

from tngp.models.tensorf import TensoRFNetwork, upsample_params
from tngp.ops.grid_sample import grid_sample_1d_cf, grid_sample_2d_cf
from tngp.render import FieldFns, RenderConfig, render_rays_train
from tngp.ops import packbits


def test_grid_sample_2d_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    plane = rng.normal(size=(4, 7, 9)).astype(np.float32)
    u = rng.uniform(-1.2, 1.2, 64).astype(np.float32)  # include out-of-range
    v = rng.uniform(-1.2, 1.2, 64).astype(np.float32)
    got = np.asarray(grid_sample_2d_cf(jnp.asarray(plane), jnp.asarray(u), jnp.asarray(v)))
    coords = torch.tensor(np.stack([u, v], -1)).view(1, -1, 1, 2)
    want = F.grid_sample(
        torch.tensor(plane)[None], coords, align_corners=True, padding_mode="zeros"
    ).squeeze(0).squeeze(-1).numpy()  # [4, 64]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_grid_sample_1d_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    line = rng.normal(size=(4, 11)).astype(np.float32)
    w = rng.uniform(-1.2, 1.2, 64).astype(np.float32)
    got = np.asarray(grid_sample_1d_cf(jnp.asarray(line), jnp.asarray(w)))
    coords = torch.tensor(np.stack([np.zeros_like(w), w], -1)).view(1, -1, 1, 2)
    want = F.grid_sample(
        torch.tensor(line)[None, :, :, None], coords, align_corners=True
    ).squeeze(0).squeeze(-1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def _smoke(decomposition):
    model = TensoRFNetwork(
        resolution=(32, 32, 32),
        sigma_rank=(4, 4, 4), color_rank=(8, 8, 8),
        decomposition=decomposition,
    )
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (16, 3), minval=-1, maxval=1)
    d = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    params = model.init(key, x, d)
    sigma, rgb = model.apply(params, x, d)
    assert sigma.shape == (16,) and rgb.shape == (16, 3)
    assert np.isfinite(np.asarray(sigma)).all()
    return model, params


def test_vm_smoke_and_render():
    model, params = _smoke("vm")
    field = FieldFns.from_model(model)
    cfg = RenderConfig(bound=1.0, grid_size=16, max_steps=64, K=32, min_near=0.05)
    bf = packbits(jnp.ones((16**3,), jnp.float32), 0.5)
    o = jnp.asarray(np.tile([0, 0, -2.5], (8, 1)), jnp.float32)
    d = jnp.asarray(np.tile([0, 0, 1.0], (8, 1)), jnp.float32)
    out = render_rays_train(field, params, o, d, bf, cfg)
    assert np.isfinite(np.asarray(out["image"])).all()

    def loss(p):
        return jnp.mean(render_rays_train(field, p, o, d, bf, cfg)["image"] ** 2)

    g = jax.grad(loss)(params)
    assert any(float(jnp.abs(l).sum()) > 0 for l in jax.tree_util.tree_leaves(g))


def test_cp_smoke():
    _smoke("cp")


def test_upsample_params():
    model, params = _smoke("vm")
    new_res = (48, 48, 48)
    up = upsample_params(params, new_res)
    model2 = TensoRFNetwork(
        resolution=new_res, sigma_rank=(4, 4, 4), color_rank=(8, 8, 8),
        decomposition="vm",
    )
    # values at shared sample points should be close (bilinear resize)
    key = jax.random.PRNGKey(1)
    x = jax.random.uniform(key, (32, 3), minval=-0.9, maxval=0.9)
    d = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    s1, c1 = model.apply(params, x, d)
    s2, c2 = model2.apply(up, x, d)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=0.2, atol=0.5)


def test_grid_sample_vjp_matches_autodiff(rng):
    from tngp.ops.grid_sample import (
        grid_sample_1d_cf,
        grid_sample_1d_cf_vjp,
        grid_sample_2d_cf,
        grid_sample_2d_cf_vjp,
    )

    plane = jnp.asarray(rng.normal(size=(4, 9, 7)), jnp.float32)
    u = jnp.asarray(rng.uniform(-0.95, 0.95, 64), jnp.float32)
    v = jnp.asarray(rng.uniform(-0.95, 0.95, 64), jnp.float32)
    g = jnp.asarray(rng.normal(size=(4, 64)), jnp.float32)

    for ac in (True, False):
        def f_ref(p, uu, vv):
            return (grid_sample_2d_cf(p, uu, vv, ac) * g).sum()

        def f_vjp(p, uu, vv):
            return (grid_sample_2d_cf_vjp(p, uu, vv, ac) * g).sum()

        gr = jax.grad(f_ref, argnums=(0, 1, 2))(plane, u, v)
        gv = jax.grad(f_vjp, argnums=(0, 1, 2))(plane, u, v)
        for a, b in zip(gr, gv):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-4)

    line = jnp.asarray(rng.normal(size=(4, 11)), jnp.float32)
    w = jnp.asarray(rng.uniform(-0.95, 0.95, 64), jnp.float32)
    gl = jnp.asarray(rng.normal(size=(4, 64)), jnp.float32)
    for ac in (True, False):
        gr = jax.grad(lambda l, ww: (grid_sample_1d_cf(l, ww, ac) * gl).sum(),
                      argnums=(0, 1))(line, w)
        gv = jax.grad(lambda l, ww: (grid_sample_1d_cf_vjp(l, ww, ac) * gl).sum(),
                      argnums=(0, 1))(line, w)
        for a, b in zip(gr, gv):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-4)
