"""D-NeRF model + time-extended occupancy grid smoke tests (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from tngp.models import DNeRFNetwork
from tngp.render import (
    FieldFns,
    RenderConfig,
    create_time,
    render_rays_train,
    time_slice_index,
    update_time_density_grid,
)


def make_model():
    model = DNeRFNetwork(bound=1.0)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (16, 3), minval=-1, maxval=1)
    d = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    params = model.init(key, x, d, jnp.float32(0.5))
    return model, params, x, d


def test_dnerf_forward_and_time_dependence():
    model, params, x, d = make_model()
    s0, rgb0, def0 = model.apply(params, x, d, jnp.float32(0.0))
    s1, rgb1, def1 = model.apply(params, x, d, jnp.float32(0.9))
    assert s0.shape == (16,) and rgb0.shape == (16, 3) and def0.shape == (16, 3)
    assert np.isfinite(np.asarray(s0)).all()
    # time must actually influence the deformation
    assert not np.allclose(np.asarray(def0), np.asarray(def1))


def test_dnerf_time_grid_and_render():
    model, params, x, d = make_model()
    T, H = 4, 16
    grid = create_time(T, 1, H)

    def density_fn(p, x_cf, t):
        return model.apply(p, x_cf, t, method=DNeRFNetwork.density_cf)["sigma"]

    key = jax.random.PRNGKey(1)
    grid = update_time_density_grid(
        grid, params, key, density_fn=density_fn, bound=1.0, grid_size=H,
        density_thresh=0.01, full=True, chunk=2048,
    )
    assert grid.density_grid.shape == (T, 1, H**3)
    assert grid.bitfield.shape == (T, H**3 // 8)
    # partial update path compiles/runs too
    grid = update_time_density_grid(
        grid, params, key, density_fn=density_fn, bound=1.0, grid_size=H,
        density_thresh=0.01, full=False, chunk=2048,
    )

    # render at a time using the matching bitfield slice
    t = jnp.float32(0.6)
    ti = int(time_slice_index(t, T))
    assert ti == 2
    field = FieldFns(
        sigma_rgb=lambda p, xc, dc: model.apply(
            p, xc, dc, t, method=DNeRFNetwork.sigma_rgb_cf
        )[:2],
        density=lambda p, xc: model.apply(
            p, xc, t, method=DNeRFNetwork.density_cf
        )["sigma"],
    )
    cfg = RenderConfig(bound=1.0, grid_size=H, max_steps=64, K=32, min_near=0.05)
    o = jnp.asarray(np.tile([0, 0, -2.5], (8, 1)), jnp.float32)
    dd = jnp.asarray(np.tile([0, 0, 1.0], (8, 1)), jnp.float32)
    bf = jnp.full((H**3 // 8,), 255, jnp.uint8)
    out = render_rays_train(field, params, o, dd, bf, cfg)
    assert np.isfinite(np.asarray(out["image"])).all()

    # deformation regularization gradient flows
    def loss(p):
        sig, rgb, deform = model.apply(
            p, o[:, None, :].reshape(-1, 3), dd.reshape(-1, 3), t
        )
        return jnp.abs(deform).mean()

    g = jax.grad(loss)(params)
    assert any(float(jnp.abs(l).sum()) > 0 for l in jax.tree_util.tree_leaves(g))


def test_dnerf_window_encoder_deform_grads():
    """D-NeRF on the fast window encoder: deform-net grads must flow through
    the canonical encode at x+Δx (input_grads=True derivative passes) and be
    comparable in magnitude to the golden tiledgrid path's."""
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (64, 3), minval=-0.9, maxval=0.9)
    d = x / jnp.linalg.norm(x, axis=-1, keepdims=True)

    def deform_grad_norm(encoding):
        model = DNeRFNetwork(bound=1.0, encoding=encoding, num_layers_deform=2,
                             hidden_dim_deform=32)
        params = model.init(jax.random.PRNGKey(1), x, d, jnp.float32(0.5))

        def loss(p):
            s, rgb, _ = model.apply(p, x, d, jnp.float32(0.3))
            return jnp.mean(s) + jnp.mean(rgb)

        g = jax.grad(loss)(params)
        leaves = {
            "/".join(str(k) for k in path): float(jnp.abs(leaf).sum())
            for path, leaf in jax.tree_util.tree_leaves_with_path(g)
        }
        return sum(v for k, v in leaves.items() if "deform_net" in k)

    g_win = deform_grad_norm("hashgrid_window")
    g_gold = deform_grad_norm("tiledgrid")
    assert g_win > 0.0, "deform grads must flow through the window encoder"
    # same order of magnitude (different tables -> not equal)
    assert g_win > g_gold * 1e-3


def test_dnerf_basis_variant():
    from tngp.models import DNeRFBasisNetwork

    model = DNeRFBasisNetwork(bound=1.0)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (8, 3), minval=-1, maxval=1)
    d = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    params = model.init(key, x, d, jnp.float32(0.3))
    s0, rgb0, _ = model.apply(params, x, d, jnp.float32(0.0))
    s1, rgb1, _ = model.apply(params, x, d, jnp.float32(0.8))
    assert s0.shape == (8,) and rgb0.shape == (8, 3)
    # time-dependent (tiny at init since hash features start ~1e-4)
    assert float(np.abs(np.asarray(s0) - np.asarray(s1)).max()) > 1e-8


def test_dnerf_hyper_variant():
    from tngp.models import DNeRFHyperNetwork

    model = DNeRFHyperNetwork(bound=1.0, ambient_dim=2)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (8, 3), minval=-1, maxval=1)
    d = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    params = model.init(key, x, d, jnp.float32(0.3))
    s0, rgb0, _ = model.apply(params, x, d, jnp.float32(0.0))
    s1, _, _ = model.apply(params, x, d, jnp.float32(0.9))
    assert s0.shape == (8,) and rgb0.shape == (8, 3)
    assert float(np.abs(np.asarray(s0) - np.asarray(s1)).max()) > 1e-10
