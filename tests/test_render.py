"""Renderer integration: analytic field rendered via the grid train path, the
iterative eval path, and the uniform path must all agree; NGP model smoke.

Field functions use the channels-first convention ([3, B] points)."""

import jax
import jax.numpy as jnp
import numpy as np

from tngp.models import NGPNetwork
from tngp.ops import packbits
from tngp.render import (
    FieldFns,
    RenderConfig,
    render_rays_eval,
    render_rays_train,
    render_rays_uniform,
)


def analytic_field():
    """Gaussian density blob at origin, position-dependent color."""

    def density(params, x_cf):
        r2 = jnp.sum(x_cf**2, axis=0)
        return 40.0 * jnp.exp(-r2 / (2 * 0.3**2))

    def sigma_rgb(params, x_cf, d_cf):
        sig = density(params, x_cf)
        rgb_cf = jax.nn.sigmoid(x_cf * 2.0)
        return sig, rgb_cf

    return FieldFns(sigma_rgb=sigma_rgb, density=density)


def make_rays(n=64, seed=0):
    rng = np.random.default_rng(seed)
    o = np.array([0.0, 0.0, -2.5]) + rng.normal(0, 0.05, size=(n, 3))
    target = rng.uniform(-0.3, 0.3, size=(n, 3))
    d = target - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


def full_bitfield(cfg):
    H3 = cfg.cascades * cfg.grid_size**3
    return packbits(jnp.ones((H3,), jnp.float32), 0.5)


def test_grid_train_vs_uniform_paths_agree():
    cfg = RenderConfig(bound=1.0, grid_size=32, max_steps=256, K=256, K_eval=64,
                       min_near=0.05)
    field = analytic_field()
    o, d = make_rays(48)
    bf = full_bitfield(cfg)
    out_train = render_rays_train(field, None, o, d, bf, cfg)
    out_eval = render_rays_eval(field, None, o, d, bf, cfg)
    out_unif = render_rays_uniform(field, None, o, d, cfg, num_steps=512, upsample_steps=0)

    img_t = np.asarray(out_train["image"])
    img_e = np.asarray(out_eval["image"])
    img_u = np.asarray(out_unif["image"])
    assert np.isfinite(img_t).all()
    # discretization differs; agreement should be close
    np.testing.assert_allclose(img_t, img_e, atol=0.02)
    np.testing.assert_allclose(img_t, img_u, atol=0.05)
    np.testing.assert_allclose(
        np.asarray(out_train["weights_sum"]), np.asarray(out_eval["weights_sum"]), atol=0.02
    )


def test_grouped_march_train_and_eval_match_flat():
    """march_group>0 must reproduce the flat path on a dense grid (grouped
    keeps whole live groups == first K rungs when everything is occupied)."""
    base = dict(bound=1.0, grid_size=32, max_steps=256, K=256, K_eval=64,
                min_near=0.05)
    field = analytic_field()
    o, d = make_rays(32)
    cfg0 = RenderConfig(**base)
    cfg8 = RenderConfig(**base, march_group=8)
    bf = full_bitfield(cfg0)

    t0 = render_rays_train(field, None, o, d, bf, cfg0)
    t8 = render_rays_train(field, None, o, d, bf, cfg8)
    np.testing.assert_allclose(
        np.asarray(t0["image"]), np.asarray(t8["image"]), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(t0["depth"]), np.asarray(t8["depth"]), atol=1e-5)

    e0 = render_rays_eval(field, None, o, d, bf, cfg0)
    e8 = render_rays_eval(field, None, o, d, bf, cfg8)
    np.testing.assert_allclose(
        np.asarray(e0["image"]), np.asarray(e8["image"]), atol=1e-4)


def test_grouped_march_sparse_grid_close_to_flat():
    """On a sparse occupancy grid the grouped path may probe extra (coarse is
    dilated/conservative) but composited images must agree: same occupied set."""
    cfg0 = RenderConfig(bound=1.0, grid_size=32, max_steps=256, K=256,
                        K_eval=64, min_near=0.05)
    cfg8 = RenderConfig(bound=1.0, grid_size=32, max_steps=256, K=256,
                        K_eval=64, min_near=0.05, march_group=8)
    field = analytic_field()
    o, d = make_rays(32, seed=5)
    # occupancy only near the blob (r < 0.6)
    H = cfg0.grid_size
    ax = (np.arange(H) + 0.5) / H * 2.0 - 1.0
    gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
    occ = ((gx**2 + gy**2 + gz**2) < 0.6**2).astype(np.float32).reshape(-1)
    bf = packbits(jnp.asarray(occ), 0.5)

    t0 = render_rays_train(field, None, o, d, bf, cfg0)
    t8 = render_rays_train(field, None, o, d, bf, cfg8)
    np.testing.assert_allclose(
        np.asarray(t0["image"]), np.asarray(t8["image"]), atol=1e-4)


def test_empty_bitfield_renders_background():
    cfg = RenderConfig(bound=1.0, grid_size=32, max_steps=128, K=32, min_near=0.05)
    field = analytic_field()
    o, d = make_rays(8)
    bf = jnp.zeros((cfg.cascades * cfg.grid_size**3 // 8,), jnp.uint8)
    out = render_rays_train(field, None, o, d, bf, cfg, bg_color=jnp.asarray([1.0, 0.5, 0.25]))
    img = np.asarray(out["image"])
    np.testing.assert_allclose(img, np.tile([1.0, 0.5, 0.25], (8, 1)), atol=1e-5)
    assert np.asarray(out["weights_sum"]).max() == 0.0


def test_ngp_model_smoke_and_render():
    model = NGPNetwork(bound=1.0, num_levels=4, log2_hashmap_size=12)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (32, 3), minval=-1, maxval=1)
    d = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    params = model.init(key, x, d)
    sigma, rgb = model.apply(params, x, d)
    assert sigma.shape == (32,) and rgb.shape == (32, 3)
    assert np.isfinite(np.asarray(sigma)).all()
    out = model.apply(params, x, method=NGPNetwork.density)
    assert out["sigma"].shape == (32,) and out["geo_feat"].shape == (32, 15)

    # batch-first and channels-first paths must agree exactly
    sigma_cf, rgb_cf = model.apply(params, x.T, d.T, method=NGPNetwork.sigma_rgb_cf)
    np.testing.assert_allclose(np.asarray(sigma_cf), np.asarray(sigma), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(rgb_cf.T), np.asarray(rgb), rtol=1e-6)

    field = FieldFns.from_model(model)
    cfg = RenderConfig(bound=1.0, grid_size=16, max_steps=64, K=32, min_near=0.05)
    o, dirs = make_rays(16)
    bf = full_bitfield(cfg)
    out = render_rays_train(field, params, o, dirs, bf, cfg, key=key)
    assert np.isfinite(np.asarray(out["image"])).all()


def test_grad_flows_through_render():
    model = NGPNetwork(bound=1.0, num_levels=4, log2_hashmap_size=12)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((4, 3))
    d = jnp.ones((4, 3)) / np.sqrt(3)
    params = model.init(key, x, d)
    field = FieldFns.from_model(model)
    cfg = RenderConfig(bound=1.0, grid_size=16, max_steps=64, K=32, min_near=0.05)
    o, dirs = make_rays(16)
    bf = full_bitfield(cfg)

    def loss_fn(p):
        out = render_rays_train(field, p, o, dirs, bf, cfg)
        return jnp.mean((out["image"] - 0.5) ** 2)

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_eval_stream_matches_round_loop():
    """Single-big-first-pass eval (eval_stream=True, default) must agree with
    the pure round-loop path, including rays that overflow K and need
    residual rounds."""
    import dataclasses

    cfg = RenderConfig(bound=1.0, grid_size=32, max_steps=256, K=64, K_eval=32,
                       min_near=0.05, density_thresh=0.5)
    field = analytic_field()
    bf = full_bitfield(cfg)
    o, d = make_rays(48)
    out_s = render_rays_eval(field, None, o, d, bf, cfg)
    out_l = render_rays_eval(
        field, None, o, d, bf, dataclasses.replace(cfg, eval_stream=False)
    )
    np.testing.assert_allclose(
        np.asarray(out_s["image"]), np.asarray(out_l["image"]), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_s["weights_sum"]), np.asarray(out_l["weights_sum"]),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_s["depth"]), np.asarray(out_l["depth"]), rtol=1e-3, atol=1e-3
    )


def test_precomputed_dilated_grid_equivalence():
    """render_rays_train/eval with a precomputed dilated_grid must equal the
    inline-build path bit-for-bit (same grid content, hoisted build)."""
    from tngp.render import dilated_chunk_grid

    cfg = RenderConfig(bound=1.0, grid_size=32, max_steps=256, K=64,
                       min_near=0.05, march_dense=True, compact_fraction=0.25,
                       march_chunk=8)
    field = analytic_field()
    o, d = make_rays(32, seed=9)
    H = cfg.grid_size
    ax = (np.arange(H) + 0.5) / H * 2.0 - 1.0
    gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
    occ = ((gx**2 + gy**2 + gz**2) < 0.5**2).astype(np.float32).reshape(-1)
    bf = packbits(jnp.asarray(occ), 0.5)
    dg = dilated_chunk_grid(bf, cfg)
    assert dg is not None

    t_inline = render_rays_train(field, None, o, d, bf, cfg)
    t_hoist = render_rays_train(field, None, o, d, bf, cfg, dilated_grid=dg)
    np.testing.assert_array_equal(
        np.asarray(t_inline["image"]), np.asarray(t_hoist["image"]))
    np.testing.assert_array_equal(
        np.asarray(t_inline["ray_mask"]), np.asarray(t_hoist["ray_mask"]))

    e_inline = render_rays_eval(field, None, o, d, bf, cfg)
    e_hoist = render_rays_eval(field, None, o, d, bf, cfg, dilated_grid=dg)
    np.testing.assert_array_equal(
        np.asarray(e_inline["image"]), np.asarray(e_hoist["image"]))


def test_occupied_rank_descend_matches_flat_searchsorted():
    """The hierarchical 128-way CDF descent (occupancy._occupied_rank_descend)
    must pick the SAME cell as the reference's flat
    searchsorted(cumsum(occ), u, 'left') for every u — all three level
    shapes: 3-level (H3 % 16384 == 0), 2-level (H3 % 128 == 0), flat tiny."""
    from tngp.render.occupancy import _occupied_rank_descend

    rng = np.random.default_rng(0)
    for H3, p in ((32 * 32 * 32, 0.07), (16 * 16 * 16, 0.2), (120, 0.3)):
        occ = (rng.random(H3) < p).astype(np.float32)
        total = occ.sum()
        u = rng.random(4096).astype(np.float32) * max(total, 1.0)
        # keep u away from exact integer CDF boundaries: left-insertion ties
        # are measure-zero in the sampler but not under a dense test sweep
        u = np.where(np.abs(u - np.round(u)) < 1e-3, u + 0.25, u)
        u = np.minimum(u, total - 1e-3)  # the nudge must not pass total
        got = np.asarray(_occupied_rank_descend(jnp.asarray(occ), jnp.asarray(u)))
        want = np.clip(
            np.searchsorted(np.cumsum(occ.astype(np.float64)), u, side="left"),
            0, H3 - 1,
        )
        np.testing.assert_array_equal(got, want, err_msg=f"H3={H3}")
        assert occ[got].all()  # every picked cell is occupied


def test_sample_occupied_cells_uniformity():
    """Empirical check: the sampler is (approximately) uniform over the
    occupied set and never returns an unoccupied cell."""
    from tngp.render.occupancy import _sample_occupied_cells

    rng = np.random.default_rng(1)
    H3 = 32 * 32 * 32
    occ = np.zeros(H3, np.float32)
    occ_ids = rng.choice(H3, size=500, replace=False)
    occ[occ_ids] = 1.0
    idx, total = _sample_occupied_cells(
        jnp.asarray(occ), jax.random.PRNGKey(0), 50000
    )
    idx = np.asarray(idx)
    assert float(total) == 500.0
    assert occ[idx].all()
    counts = np.bincount(idx, minlength=H3)[occ_ids]
    # each occupied cell expects 100 hits; bound the spread loosely
    assert counts.min() > 40 and counts.max() < 200
