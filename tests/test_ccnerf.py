"""CCNeRF: residual outputs, finalize consistency, compress, compose."""

import jax
import jax.numpy as jnp
import numpy as np

from tngp.models.ccnerf import (
    CCConfig,
    CCScene,
    cc_compress,
    cc_density_cf,
    cc_finalize,
    cc_init,
    cc_sigma_rgb_cf,
)


def small_cfg():
    return CCConfig(
        resolution=(24, 24, 24),
        rank_vec_density=(8, 8, 8), rank_mat_density=(0, 2, 4),
        rank_vec=(8, 8, 8), rank_mat=(0, 2, 4),
    )


def test_residual_outputs_cumulative(rng):
    cfg = small_cfg()
    params = cc_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.uniform(-0.9, 0.9, (3, 32)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(3, 32)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=0, keepdims=True)
    sig, rgb = cc_sigma_rgb_cf(params, cfg, x, d, residual=True)
    assert sig.shape == (3, 32) and rgb.shape == (3, 3, 32)
    # last cumulative output equals the non-residual full output
    sig_f, rgb_f = cc_sigma_rgb_cf(params, cfg, x, d, residual=False)
    np.testing.assert_allclose(np.asarray(sig[-1]), np.asarray(sig_f), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rgb[-1]), np.asarray(rgb_f), rtol=1e-5)


def test_finalize_preserves_full_rank_output(rng):
    cfg = small_cfg()
    params = cc_init(jax.random.PRNGKey(1), cfg)
    x = jnp.asarray(rng.uniform(-0.9, 0.9, (3, 16)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(3, 16)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=0, keepdims=True)
    sig0, rgb0 = cc_sigma_rgb_cf(params, cfg, x, d)
    fparams, fcfg = cc_finalize(params, cfg)
    assert fcfg.K == 1
    sig1, rgb1 = cc_sigma_rgb_cf(fparams, fcfg, x, d)
    np.testing.assert_allclose(np.asarray(sig0), np.asarray(sig1), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(rgb0), np.asarray(rgb1), rtol=1e-4)


def test_compress_runs_and_shrinks(rng):
    cfg = small_cfg()
    params = cc_init(jax.random.PRNGKey(2), cfg)
    cparams, ccfg = cc_compress(params, cfg, (4, 2, 4, 2))
    assert ccfg.rank_vec == (4,)
    assert cparams["vd_U_0"][0].shape[0] == 4
    x = jnp.asarray(rng.uniform(-0.9, 0.9, (3, 8)), jnp.float32)
    d = x / jnp.linalg.norm(x, axis=0, keepdims=True)
    sig, rgb = cc_sigma_rgb_cf(cparams, ccfg, x, d)
    assert np.isfinite(np.asarray(sig)).all()


def test_compose_two_objects(rng):
    cfg = small_cfg()
    p1 = cc_init(jax.random.PRNGKey(3), cfg)
    p2 = cc_init(jax.random.PRNGKey(4), cfg)
    scene = CCScene()
    scene.add(p1, cfg)
    ang = 0.5
    R = np.array([[np.cos(ang), 0, -np.sin(ang)], [0, 1, 0], [np.sin(ang), 0, np.cos(ang)]])
    scene.add(p2, cfg, R=R, s=0.5, t=np.array([0.3, 0, 0]))
    x = jnp.asarray(rng.uniform(-0.9, 0.9, (3, 16)), jnp.float32)
    d = x / jnp.linalg.norm(x, axis=0, keepdims=True)
    sig, rgb = scene.sigma_rgb_cf(x, d)
    assert sig.shape == (16,) and rgb.shape == (3, 16)
    assert np.isfinite(np.asarray(sig)).all() and np.isfinite(np.asarray(rgb)).all()
    dens = scene.density_cf(x)
    assert np.isfinite(np.asarray(dens)).all()
