"""Frame-level persistent-alive-set eval (render/frame_eval.py) must agree
with the per-chunk render_rays_eval path — same first pass, different
residual-round batching (frame-global tiers vs per-chunk while_loop)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from tngp.ops import packbits
from tngp.render import RenderConfig, dilated_chunk_grid, render_rays_eval
from tngp.render.frame_eval import FrameRenderer

from test_render import analytic_field, make_rays


def sparse_bitfield(cfg, r=0.5):
    H = cfg.grid_size
    ax = (np.arange(H) + 0.5) / H * 2.0 - 1.0
    gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
    occ = ((gx**2 + gy**2 + gz**2) < r**2).astype(np.float32).reshape(-1)
    return packbits(jnp.asarray(occ), 0.5)


def _run_both(cfg, n_rays, seed, chunk, include_miss=False):
    field = analytic_field()
    o, d = make_rays(n_rays, seed=seed)
    if include_miss:
        # point the last quarter of rays away from the AABB (near=far=BIG)
        o = o.at[-n_rays // 4 :].set(jnp.asarray([0.0, 0.0, -5.0]))
        d = d.at[-n_rays // 4 :].set(jnp.asarray([0.0, 0.0, -1.0]))
    bf = sparse_bitfield(cfg)
    dg = dilated_chunk_grid(bf, cfg)

    fr = FrameRenderer(field, cfg, chunk=chunk)
    img_f, dep_f = fr.render(None, o, d, bf, dg)

    imgs, deps = [], []
    n = o.shape[0]
    pad = (-n) % chunk
    o_p = jnp.pad(o, ((0, pad), (0, 0)))
    d_p = jnp.pad(d, ((0, pad), (0, 0)))
    for s in range(0, n + pad, chunk):
        out = render_rays_eval(
            field, None, o_p[s : s + chunk], d_p[s : s + chunk], bf, cfg,
            dilated_grid=dg,
        )
        imgs.append(np.asarray(out["image"]))
        deps.append(np.asarray(out["depth"]))
    img_c = np.concatenate(imgs)[:n]
    dep_c = np.concatenate(deps)[:n]
    return np.asarray(img_f), np.asarray(dep_f), img_c, dep_c


def test_frame_eval_matches_chunked_eval():
    cfg = RenderConfig(bound=1.0, grid_size=32, max_steps=256, K=64, K_eval=32,
                       min_near=0.05, march_chunk=8)
    img_f, dep_f, img_c, dep_c = _run_both(cfg, n_rays=96, seed=3, chunk=64)
    np.testing.assert_allclose(img_f, img_c, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(dep_f, dep_c, rtol=1e-3, atol=1e-3)


def test_frame_eval_tiny_budget_forces_residual_rounds():
    """A starved first pass leaves most rays alive: the frame-global rounds
    must converge to the same integral as the per-chunk loop."""
    cfg = RenderConfig(bound=1.0, grid_size=32, max_steps=256, K=64, K_eval=16,
                       min_near=0.05, march_chunk=8, eval_budget=0.05)
    img_f, dep_f, img_c, dep_c = _run_both(cfg, n_rays=80, seed=7, chunk=32)
    np.testing.assert_allclose(img_f, img_c, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(dep_f, dep_c, rtol=1e-3, atol=1e-3)


def test_frame_eval_handles_missed_rays_and_padding():
    cfg = RenderConfig(bound=1.0, grid_size=32, max_steps=256, K=64, K_eval=32,
                       min_near=0.05, march_chunk=8)
    img_f, dep_f, img_c, dep_c = _run_both(
        cfg, n_rays=50, seed=11, chunk=32, include_miss=True
    )
    np.testing.assert_allclose(img_f, img_c, rtol=1e-4, atol=1e-4)
    # missed rays render pure background (ws == 0 -> bg=1.0 everywhere)
    np.testing.assert_allclose(img_f[-12:], 1.0, atol=1e-6)


def test_frame_eval_bg_color_and_dtype():
    cfg = RenderConfig(bound=1.0, grid_size=32, max_steps=256, K=64, K_eval=32,
                       min_near=0.05, march_chunk=8)
    field = analytic_field()
    o, d = make_rays(40, seed=1)
    bf = sparse_bitfield(cfg)
    dg = dilated_chunk_grid(bf, cfg)
    fr = FrameRenderer(field, cfg, chunk=32)
    bg = jnp.asarray([1.0, 0.5, 0.25])
    img, dep = fr.render(None, o, d, bf, dg, bg_color=bg)
    img = np.asarray(img)
    assert img.shape == (40, 3) and np.isfinite(img).all()
    out = render_rays_eval(field, None, jnp.pad(o, ((0, 24), (0, 0))),
                           jnp.pad(d, ((0, 24), (0, 0))), bf, cfg,
                           bg_color=bg, dilated_grid=dg)
    np.testing.assert_allclose(img, np.asarray(out["image"])[:40],
                               rtol=1e-4, atol=1e-4)


def test_frame_eval_padding_rays_die_immediately():
    """Regression (round 4): jnp.pad's all-zero fill rays (o=0, d=0) get
    far=+inf from the slab test and — in a scene whose ORIGIN cell is empty —
    never saturate, pinning every frame at max_rounds with a full-tier round
    each (the on-chip 'alive stuck at 7168 = pad count' bug).  Pads must miss
    the aabb and retire in the first pass."""
    import jax

    cfg = RenderConfig(bound=1.0, grid_size=32, max_steps=256, K=64, K_eval=16,
                       min_near=0.05, march_chunk=8, eval_budget=0.05)

    def density(params, x_cf):  # shell blob AWAY from the origin
        r2 = jnp.sum((x_cf - 0.55) ** 2, axis=0)
        return 30.0 * jnp.exp(-r2 / (2 * 0.15**2))

    def sigma_rgb(params, x_cf, d_cf):
        return density(params, x_cf), jax.nn.sigmoid(x_cf * 2.0)

    from tngp.render import FieldFns

    field = FieldFns(sigma_rgb=sigma_rgb, density=density)
    o, d = make_rays(50, seed=5)
    bf = sparse_bitfield(cfg, r=0.9)  # origin cell occupied: pads DO march
    dg = dilated_chunk_grid(bf, cfg)
    fr = FrameRenderer(field, cfg, chunk=32)  # pad = 14 rays
    img, dep = fr.render(None, o, d, bf, dg, max_rounds=40)
    assert np.isfinite(np.asarray(img)).all()
    # real rays need a few starved rounds; the 14 pad rays must not pin the
    # loop at max_rounds
    assert fr.last_rounds < 40, f"pad rays never died ({fr.last_rounds} rounds)"
