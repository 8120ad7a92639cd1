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
