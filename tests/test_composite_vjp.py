"""Analytic stream-compositor VJP vs the autodiff oracle.

`composite_stream` carries a closed-form custom VJP (the reference computes
the same closed form in CUDA, raymarching.cu:601-691); `composite_stream_ref`
is the identical forward with backward left to autodiff of the segmented
scans.  Outputs and input gradients must match to fp32 tolerance on
adversarial streams (empty rays, padding slots, early-terminated segments).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tngp.ops.composite import composite_stream, composite_stream_ref


def _make_stream(rng, M=512, N=37, empty_frac=0.2, hot_frac=0.3):
    """Ray-major compacted stream with some empty rays, some saturating
    (early-termination) segments, and a padding tail."""
    lengths = rng.integers(0, 2 * M // N, size=N)
    lengths[rng.random(N) < empty_frac] = 0
    while lengths.sum() > M - 8:
        lengths[rng.integers(0, N)] = 0
    ray_id = np.repeat(np.arange(N, dtype=np.int32), lengths)
    M_used = len(ray_id)
    ray_id = np.concatenate([ray_id, np.full(M - M_used, N - 1, np.int32)])
    valid = np.zeros(M, bool)
    valid[:M_used] = True
    # a few invalid holes inside the live prefix too
    valid[rng.integers(0, max(M_used, 1), size=M // 32)] = False

    sig = rng.gamma(1.0, 2.0, size=M).astype(np.float32)
    hot = rng.random(N) < hot_frac  # rays dense enough to early-terminate
    sig = np.where(hot[np.clip(ray_id, 0, N - 1)], sig * 50.0, sig)
    rgb = rng.random((3, M)).astype(np.float32)
    dts = (0.01 + 0.02 * rng.random(M)).astype(np.float32)
    gaps = dts * (1.0 + rng.random(M).astype(np.float32))
    return (
        jnp.asarray(sig), jnp.asarray(rgb), jnp.asarray(dts),
        jnp.asarray(gaps), jnp.asarray(ray_id), jnp.asarray(valid),
    )


@pytest.mark.parametrize("use_tcum", [False, True])
def test_stream_vjp_matches_autodiff(use_tcum):
    rng = np.random.default_rng(3)
    N = 37
    sig, rgb, dts, gaps, rid, valid = _make_stream(rng, N=N)
    t_cum = jnp.cumsum(gaps * valid) * 0.1 if use_tcum else None
    cw = jnp.asarray([0.3, 1.1, -0.7])

    def make_loss(fn):
        if use_tcum:
            def f(s, r, d, tc):
                ws, depth, img = fn(s, r, d, None, rid, valid, N, 1e-4, t_cum=tc)
                return (img @ cw).sum() + 0.37 * ws.sum() + 0.11 * depth.sum()
            return f, (sig, rgb, dts, t_cum)
        def f(s, r, d, g):
            ws, depth, img = fn(s, r, d, g, rid, valid, N, 1e-4)
            return (img @ cw).sum() + 0.37 * ws.sum() + 0.11 * depth.sum()
        return f, (sig, rgb, dts, gaps)

    f_new, args = make_loss(composite_stream)
    f_ref, _ = make_loss(composite_stream_ref)
    v_new, g_new = jax.value_and_grad(f_new, argnums=(0, 1, 2, 3))(*args)
    v_ref, g_ref = jax.value_and_grad(f_ref, argnums=(0, 1, 2, 3))(*args)
    assert np.allclose(v_new, v_ref, rtol=1e-5, atol=1e-5)
    names = ["sigmas", "rgbs", "dts", "t_cum" if use_tcum else "gaps"]
    for nm, a, b in zip(names, g_new, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
            err_msg=f"grad mismatch: {nm} (use_tcum={use_tcum})",
        )


def test_stream_vjp_bf16_inputs():
    """bf16 sigma/rgb inputs (the train path's field outputs) round-trip the
    custom VJP with matching cotangent dtypes."""
    rng = np.random.default_rng(7)
    N = 16
    sig, rgb, dts, gaps, rid, valid = _make_stream(rng, M=256, N=N)
    sigb, rgbb = sig.astype(jnp.bfloat16), rgb.astype(jnp.bfloat16)

    def f(fn, s, r):
        ws, depth, img = fn(s, r, dts, gaps, rid, valid, N)
        return img.sum() + ws.sum()

    g = jax.grad(lambda s, r: f(composite_stream, s, r), argnums=(0, 1))(sigb, rgbb)
    assert g[0].dtype == jnp.bfloat16 and g[1].dtype == jnp.bfloat16
    gr = jax.grad(lambda s, r: f(composite_stream_ref, s, r), argnums=(0, 1))(sigb, rgbb)
    np.testing.assert_allclose(
        np.asarray(g[0], np.float32), np.asarray(gr[0], np.float32),
        rtol=2e-2, atol=2e-2,
    )
    np.testing.assert_allclose(
        np.asarray(g[1], np.float32), np.asarray(gr[1], np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_stream_vjp_under_jit_and_grad_of_weights_only():
    """weights_sum-only losses (random-bg alpha supervision) and jit."""
    rng = np.random.default_rng(11)
    N = 24
    sig, rgb, dts, gaps, rid, valid = _make_stream(rng, M=384, N=N)

    @jax.jit
    def gnew(s):
        return jax.grad(
            lambda ss: composite_stream(ss, rgb, dts, gaps, rid, valid, N)[0].sum()
        )(s)

    @jax.jit
    def gref(s):
        return jax.grad(
            lambda ss: composite_stream_ref(ss, rgb, dts, gaps, rid, valid, N)[0].sum()
        )(s)

    np.testing.assert_allclose(
        np.asarray(gnew(sig)), np.asarray(gref(sig)), rtol=1e-5, atol=1e-6
    )
