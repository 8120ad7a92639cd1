"""Morton/packbits/aabb/sph/losses/sample_pdf/trunc_exp golden tests."""

import jax
import jax.numpy as jnp
import numpy as np

from tngp.ops import (
    eff_distloss,
    huber_loss,
    mape_loss,
    morton3d,
    morton3d_invert,
    near_far_from_aabb,
    packbits,
    sample_pdf,
    sph_from_ray,
    trunc_exp,
    bitfield_probe,
)


def test_morton_roundtrip(rng):
    c = rng.integers(0, 1024, size=(256, 3)).astype(np.int32)
    codes = morton3d(jnp.asarray(c))
    back = morton3d_invert(codes)
    np.testing.assert_array_equal(np.asarray(back), c)


def test_morton_known_values():
    # interleave: x bit0 -> bit0, y bit0 -> bit1, z bit0 -> bit2
    assert int(morton3d(jnp.asarray([[1, 0, 0]]))[0]) == 1
    assert int(morton3d(jnp.asarray([[0, 1, 0]]))[0]) == 2
    assert int(morton3d(jnp.asarray([[0, 0, 1]]))[0]) == 4
    assert int(morton3d(jnp.asarray([[2, 0, 0]]))[0]) == 8
    assert int(morton3d(jnp.asarray([[7, 7, 7]]))[0]) == 511


def test_packbits_and_probe(rng):
    grid = rng.uniform(0, 1, size=(1024,)).astype(np.float32)
    thresh = 0.5
    bf = np.asarray(packbits(jnp.asarray(grid), thresh))
    # bit layout matches CUDA: byte i>>3, bit 1<<(i&7)
    for i in [0, 1, 7, 8, 100, 1023]:
        bit = (bf[i // 8] >> (i % 8)) & 1
        assert bool(bit) == bool(grid[i] > thresh)
    probes = bitfield_probe(jnp.asarray(bf), jnp.arange(1024))
    np.testing.assert_array_equal(np.asarray(probes), grid > thresh)


def test_near_far_aabb(rng):
    aabb = jnp.asarray([-1, -1, -1, 1, 1, 1], jnp.float32)
    o = jnp.asarray([[0, 0, -3]], jnp.float32)
    d = jnp.asarray([[0, 0, 1]], jnp.float32)
    near, far = near_far_from_aabb(o, d, aabb, 0.05)
    np.testing.assert_allclose(np.asarray(near)[0], 2.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(far)[0], 4.0, rtol=1e-6)
    # miss
    d2 = jnp.asarray([[1, 0, 0]], jnp.float32)
    near2, far2 = near_far_from_aabb(o, d2, aabb, 0.05)
    assert float(near2[0]) > 1e30 and float(far2[0]) > 1e30
    # inside the box: near clamps to min_near
    o3 = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    near3, far3 = near_far_from_aabb(o3, d, aabb, 0.05)
    np.testing.assert_allclose(float(near3[0]), 0.05)
    np.testing.assert_allclose(float(far3[0]), 1.0, rtol=1e-6)


def test_sph_from_ray():
    o = jnp.asarray([[0.1, -0.2, 0.3]], jnp.float32)
    d = jnp.asarray([[0.3, 0.4, 0.5]], jnp.float32)
    d = d / jnp.linalg.norm(d)
    radius = 10.0
    coords = np.asarray(sph_from_ray(o, d, radius))
    assert coords.shape == (1, 2)
    assert np.all(coords >= -1.0) and np.all(coords <= 1.0)
    # reconstruct the intersection point and check it's on the sphere
    theta = (coords[0, 0] + 1) * np.pi / 2
    phi = coords[0, 1] * np.pi
    p = radius * np.array([np.sin(theta) * np.cos(phi), np.cos(theta), np.sin(theta) * np.sin(phi)])
    np.testing.assert_allclose(np.linalg.norm(p), radius, rtol=1e-5)
    # p must lie on the ray
    t = np.dot(p - np.asarray(o)[0], np.asarray(d)[0])
    np.testing.assert_allclose(p, np.asarray(o)[0] + t * np.asarray(d)[0], atol=1e-3)


def test_losses(rng):
    p = jnp.asarray(rng.normal(size=(64, 1)), jnp.float32)
    t = jnp.asarray(rng.normal(size=(64, 1)), jnp.float32)
    m = float(mape_loss(p, t))
    want = np.mean(np.abs(np.asarray(p) - np.asarray(t)) / (np.abs(np.asarray(t)) + 1e-2))
    np.testing.assert_allclose(m, want, rtol=1e-5)
    h = float(huber_loss(p, t, delta=0.1))
    assert h > 0


def test_eff_distloss_vs_naive(rng):
    B, N = 4, 16
    w = jnp.asarray(rng.uniform(0, 1, (B, N)), jnp.float32)
    m = jnp.asarray(np.sort(rng.uniform(0, 1, (B, N)), axis=-1), jnp.float32)
    interval = 1.0 / N
    got = float(eff_distloss(w, m, interval))
    wn, mn = np.asarray(w), np.asarray(m)
    naive = 0.0
    for b in range(B):
        naive += (1 / 3) * interval * (wn[b] ** 2).sum()
        naive += np.sum(wn[b][:, None] * wn[b][None, :] * np.abs(mn[b][:, None] - mn[b][None, :]))
    naive /= B
    np.testing.assert_allclose(got, naive, rtol=1e-4)


def test_sample_pdf_deterministic():
    bins = jnp.linspace(0, 1, 9)[None, :].repeat(2, axis=0)  # [2, 9]
    w = jnp.zeros((2, 8)).at[:, 3].set(1.0)  # all mass in bin 3
    samples = np.asarray(sample_pdf(bins, w, 16, det=True))
    assert samples.shape == (2, 16)
    # nearly all samples should fall inside bin 3: [0.375, 0.5]
    frac = np.mean((samples >= 0.374) & (samples <= 0.501))
    assert frac > 0.9


def test_trunc_exp_grad_clamps():
    g = jax.grad(lambda x: trunc_exp(x))(jnp.float32(20.0))
    np.testing.assert_allclose(float(g), np.exp(15.0), rtol=1e-5)
    v = trunc_exp(jnp.float32(20.0))
    np.testing.assert_allclose(float(v), np.exp(20.0), rtol=1e-5)
