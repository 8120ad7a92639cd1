"""Compositing vs a scalar-loop simulator of the CUDA train kernels, including
the closed-form backward formula (raymarching.cu:500-691)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.test_util import check_grads

from tngp.ops import composite_rays


def ref_forward(sigmas, rgbs, dts, gaps, mask, T_thresh):
    N, K = sigmas.shape
    ws = np.zeros(N)
    depth = np.zeros(N)
    image = np.zeros((N, 3))
    for n in range(N):
        T = 1.0
        t = 0.0
        for k in range(K):
            if not mask[n, k]:
                continue
            alpha = 1.0 - np.exp(-sigmas[n, k] * dts[n, k])
            w = alpha * T
            image[n] += w * rgbs[n, k]
            t += gaps[n, k]
            depth[n] += w * t
            ws[n] += w
            T *= 1.0 - alpha
            if T < T_thresh:
                break
    return ws, depth, image


def ref_backward(g_ws, g_depth, g_image, sigmas, rgbs, dts, gaps, mask, T_thresh):
    """Closed-form gradient re-walk, raymarching.cu:601-691."""
    N, K = sigmas.shape
    ws_f, d_f, im_f = ref_forward(sigmas, rgbs, dts, gaps, mask, T_thresh)
    g_sig = np.zeros_like(sigmas)
    g_rgb = np.zeros_like(rgbs)
    for n in range(N):
        T = 1.0
        r = np.zeros(3)
        t = 0.0
        d = 0.0
        ws = 0.0
        for k in range(K):
            if not mask[n, k]:
                continue
            alpha = 1.0 - np.exp(-sigmas[n, k] * dts[n, k])
            w = alpha * T
            r += w * rgbs[n, k]
            t += gaps[n, k]
            d += w * t
            ws += w
            T *= 1.0 - alpha
            g_rgb[n, k] = g_image[n] * w
            g_sig[n, k] = dts[n, k] * (
                np.dot(g_image[n], T * rgbs[n, k] - (im_f[n] - r))
                + g_depth[n] * (T * t - (d_f[n] - d))
                + g_ws[n] * (1 - ws_f[n])
            )
            if T < T_thresh:
                break
    return g_sig, g_rgb


def make_case(rng, N=8, K=32, thresh=1e-4):
    sigmas = rng.uniform(0, 20, (N, K))
    rgbs = rng.uniform(0, 1, (N, K, 3))
    dts = rng.uniform(0.001, 0.01, (N, K))
    gaps = dts + rng.uniform(0, 0.01, (N, K))
    mask = rng.uniform(size=(N, K)) > 0.3
    return sigmas, rgbs, dts, gaps, mask, thresh


def test_composite_forward_matches(rng):
    sigmas, rgbs, dts, gaps, mask, thresh = make_case(rng)
    ws, depth, image, _ = composite_rays(
        jnp.asarray(sigmas, jnp.float32), jnp.asarray(rgbs, jnp.float32),
        jnp.asarray(dts, jnp.float32), jnp.asarray(gaps, jnp.float32),
        jnp.asarray(mask), thresh,
    )
    ws_r, depth_r, image_r = ref_forward(sigmas, rgbs, dts, gaps, mask, thresh)
    np.testing.assert_allclose(np.asarray(ws), ws_r, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth), depth_r, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(image), image_r, rtol=1e-4, atol=1e-5)


def test_composite_backward_matches_closed_form(rng):
    sigmas, rgbs, dts, gaps, mask, thresh = make_case(rng, thresh=0.0)
    # thresh=0 disables early stop so autodiff matches the closed form exactly
    g_ws = rng.normal(size=(8,))
    g_depth = rng.normal(size=(8,))
    g_image = rng.normal(size=(8, 3))

    def f(sig, rgb):
        ws, depth, image, _ = composite_rays(
            sig, rgb, jnp.asarray(dts, jnp.float32), jnp.asarray(gaps, jnp.float32),
            jnp.asarray(mask), 0.0,
        )
        return (
            (ws * g_ws).sum() + (depth * g_depth).sum() + (image * g_image).sum()
        )

    gs, gr = jax.grad(f, argnums=(0, 1))(
        jnp.asarray(sigmas, jnp.float32), jnp.asarray(rgbs, jnp.float32)
    )
    gs_r, gr_r = ref_backward(g_ws, g_depth, g_image, sigmas, rgbs, dts, gaps, mask, 0.0)
    np.testing.assert_allclose(np.asarray(gs), gs_r, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gr), gr_r, rtol=1e-3, atol=1e-5)


def test_composite_gradcheck(rng):
    sigmas, rgbs, dts, gaps, mask, _ = make_case(rng, N=4, K=8, thresh=0.0)

    def f(sig, rgb):
        ws, depth, image, _ = composite_rays(
            sig, rgb, jnp.asarray(dts, jnp.float32), jnp.asarray(gaps, jnp.float32),
            jnp.asarray(mask), 0.0,
        )
        return ws.sum() + depth.sum() + image.sum()

    check_grads(f, (jnp.asarray(sigmas, jnp.float32), jnp.asarray(rgbs, jnp.float32)),
                order=1, modes=["rev"], atol=5e-2, rtol=5e-2)


def test_composite_early_stop_zeroes_tail():
    # one ray, huge density at step 2 -> everything after gets ~zero weight
    sigmas = jnp.asarray([[1.0, 1e6, 5.0, 5.0]], jnp.float32)
    rgbs = jnp.ones((1, 4, 3), jnp.float32)
    dts = jnp.full((1, 4), 0.01, jnp.float32)
    mask = jnp.ones((1, 4), bool)
    ws, depth, image, w = composite_rays(sigmas, rgbs, dts, dts, mask, 1e-4)
    w = np.asarray(w)
    assert w[0, 2] == 0.0 and w[0, 3] == 0.0
    assert abs(np.asarray(ws)[0] - 1.0) < 1e-3


def test_composite_stream_matches_slab():
    """Stream compositor (segmented scans over compacted samples) reproduces
    composite_rays_cf on the same sample set."""
    from tngp.ops.compaction import compact_mask, gather_cf
    from tngp.ops.composite import composite_rays_cf, composite_stream

    rng = np.random.default_rng(11)
    N, K = 24, 32
    mask = rng.uniform(size=(N, K)) < 0.6
    # make a few rays empty
    mask[3] = False
    mask[17] = False
    sig = (rng.uniform(size=(N, K)) * 40).astype(np.float32) * mask
    rgb = rng.uniform(size=(3, N, K)).astype(np.float32)
    dts = np.full((N, K), 0.02, np.float32)
    gaps = (rng.uniform(size=(N, K)).astype(np.float32) * 0.05) * mask

    ws_s, depth_s, img_s, _ = composite_rays_cf(
        jnp.asarray(sig), jnp.asarray(rgb), jnp.asarray(dts), jnp.asarray(gaps),
        jnp.asarray(mask), 1e-4,
    )

    M_budget = int(mask.sum()) + 8  # generous: nothing dropped
    comp = compact_mask(jnp.asarray(mask), M_budget)
    ray_id = comp.sel.astype(jnp.int32) // K
    sig_c = jnp.take(jnp.asarray(sig).reshape(-1), comp.sel)
    rgb_c = gather_cf(jnp.asarray(rgb).reshape(3, -1), comp)
    dt_c = jnp.take(jnp.asarray(dts).reshape(-1), comp.sel)
    gap_c = jnp.take(jnp.asarray(gaps).reshape(-1), comp.sel)
    ws, depth, img = composite_stream(
        sig_c, rgb_c, dt_c, gap_c, ray_id, comp.sel_valid, N, 1e-4
    )
    np.testing.assert_allclose(np.asarray(ws), np.asarray(ws_s), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(depth_s), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(img), np.asarray(img_s), rtol=1e-5, atol=1e-6)


def test_composite_stream_grads_flow():
    from tngp.ops.composite import composite_stream

    rng = np.random.default_rng(12)
    M, N = 64, 8
    ray_id = jnp.asarray(np.sort(rng.integers(0, N, M)).astype(np.int32))
    sig = jnp.asarray(rng.uniform(size=(M,)).astype(np.float32) * 20)
    rgb = jnp.asarray(rng.uniform(size=(3, M)).astype(np.float32))
    dt = jnp.full((M,), 0.03)
    valid = jnp.asarray(rng.uniform(size=(M,)) < 0.9)

    def loss(s, r):
        ws, depth, img = composite_stream(s, r, dt, dt, ray_id, valid, N, 1e-4)
        return jnp.sum(img**2) + jnp.sum(ws) + jnp.sum(depth)

    gs, gr = jax.grad(loss, argnums=(0, 1))(sig, rgb)
    assert np.isfinite(np.asarray(gs)).all() and np.isfinite(np.asarray(gr)).all()
    assert float(jnp.abs(gs).sum()) > 0 and float(jnp.abs(gr).sum()) > 0
