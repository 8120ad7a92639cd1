"""Global sample compaction: exact when the budget covers all valid samples;
budget-limited drops match the reference's overflow-drop semantics."""

import jax
import jax.numpy as jnp
import numpy as np
from dataclasses import replace

from tngp.ops.compaction import compact_mask, expand_to_slab, gather_cf
from tngp.ops import packbits
from tngp.render import FieldFns, RenderConfig, render_rays_train


def test_compact_mask_roundtrip(rng):
    N, K = 16, 32
    mask = jnp.asarray(rng.uniform(size=(N, K)) < 0.3)
    M_budget = 256
    comp = compact_mask(mask, M_budget)
    total = int(mask.sum())
    assert int(comp.sel_valid.sum()) == min(total, M_budget)
    # values roundtrip: scatter-free expand(gather(x)) == x on valid slots
    x = jnp.asarray(rng.normal(size=(1, N * K)), jnp.float32)
    xc = gather_cf(x, comp)
    back = expand_to_slab(xc[0], comp, N, K)
    want = np.where(np.asarray(mask), np.asarray(x).reshape(N, K), 0.0)
    np.testing.assert_allclose(np.asarray(back), want, rtol=1e-6)


def analytic_field():
    def density(params, x_cf):
        return 30.0 * jnp.exp(-jnp.sum(x_cf**2, axis=0) / (2 * 0.3**2))

    def sigma_rgb(params, x_cf, d_cf):
        return density(params, x_cf), jax.nn.sigmoid(x_cf)

    return FieldFns(sigma_rgb=sigma_rgb, density=density)


def test_compacted_render_matches_full():
    cfg = RenderConfig(bound=1.0, grid_size=32, max_steps=128, K=64, min_near=0.05)
    field = analytic_field()
    rng = np.random.default_rng(0)
    o = jnp.asarray(np.array([0, 0, -2.5]) + rng.normal(0, 0.05, (32, 3)), jnp.float32)
    d = np.asarray(rng.uniform(-0.3, 0.3, (32, 3))) - np.asarray(o)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)
    bf = packbits(jnp.ones((32**3,), jnp.float32), 0.5)

    full = render_rays_train(field, None, o, d, bf, cfg)
    # generous budget -> identical
    cfg_c = replace(cfg, compact_fraction=0.99)
    comp = render_rays_train(field, None, o, d, bf, cfg_c)
    np.testing.assert_allclose(
        np.asarray(comp["image"]), np.asarray(full["image"]), atol=1e-5
    )
    # tight budget -> still finite/valid, close-ish (front samples dominate)
    cfg_t = replace(cfg, compact_fraction=0.3)
    tight = render_rays_train(field, None, o, d, bf, cfg_t)
    assert np.isfinite(np.asarray(tight["image"])).all()


def test_compact_mask_hier_matches_flat_prefix(rng):
    """Hierarchical compaction selects exactly the flat-order prefix."""
    from tngp.ops.compaction import compact_mask_hier, ray_in_budget_from_counts

    N, K = 64, 96  # N*K = 6144, not a multiple of G -> exercises padding
    mask = jnp.asarray(rng.uniform(size=(N, K)) < 0.25)
    flat = np.flatnonzero(np.asarray(mask).reshape(-1))
    for M_budget in (128, 1024, 8192):
        # chunk_budget=N*K/G: degenerate full chunk set -> exact flat prefix
        # for ANY mask (the default 3*M/G budget assumes march-style run
        # clustering; see the truncation test below)
        comp = compact_mask_hier(mask, M_budget, G=8, chunk_budget=N * K // 8)
        m_eff = int(comp.m_eff)
        assert m_eff == min(len(flat), M_budget)
        np.testing.assert_array_equal(
            np.asarray(comp.sel[:m_eff]), flat[:m_eff]
        )
        assert int(comp.sel_valid.sum()) == m_eff
        # ray_mask: ray fully in budget iff cumsum(counts) <= m_eff
        counts = np.asarray(mask.sum(axis=-1))
        rm = np.asarray(ray_in_budget_from_counts(jnp.asarray(counts), m_eff))
        want_rm = np.cumsum(counts) <= m_eff
        np.testing.assert_array_equal(rm, want_rm)


def test_compact_mask_hier_chunk_truncation(rng):
    """A tight chunk budget truncates to a (shorter) exact prefix."""
    from tngp.ops.compaction import compact_mask_hier

    N, K = 32, 64
    mask = jnp.asarray(rng.uniform(size=(N, K)) < 0.3)
    flat = np.flatnonzero(np.asarray(mask).reshape(-1))
    comp = compact_mask_hier(mask, 2048, G=8, chunk_budget=128)
    m_eff = int(comp.m_eff)
    assert 0 < m_eff <= min(len(flat), 2048)
    np.testing.assert_array_equal(np.asarray(comp.sel[:m_eff]), flat[:m_eff])
