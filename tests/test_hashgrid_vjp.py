"""Custom-VJP hash encode must match pure autodiff exactly (table grad via
scatter path, input grad via the analytic dy_dx formula)."""

import jax
import jax.numpy as jnp
import numpy as np

from tngp.ops import HashGridSpec
from tngp.ops.hashgrid import hash_encode_cf, hash_encode_cf_vjp


def check(spec, seed=0, B=64):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(0.02, 0.98, (spec.input_dim, B)), jnp.float32)
    table = spec.init_table(jax.random.PRNGKey(1)) * 1e4
    g = jnp.asarray(rng.normal(size=(spec.output_dim, B)), jnp.float32)

    def f_ref(x, t):
        return (hash_encode_cf(x, t, spec) * g).sum()

    def f_vjp(x, t):
        return (hash_encode_cf_vjp(x, t, spec) * g).sum()

    out_r = hash_encode_cf(x, table, spec)
    out_v = hash_encode_cf_vjp(x, table, spec)
    np.testing.assert_allclose(np.asarray(out_v), np.asarray(out_r), rtol=1e-6)

    gx_r, gt_r = jax.grad(f_ref, argnums=(0, 1))(x, table)
    gx_v, gt_v = jax.grad(f_vjp, argnums=(0, 1))(x, table)
    np.testing.assert_allclose(np.asarray(gt_v), np.asarray(gt_r), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx_v), np.asarray(gx_r), rtol=1e-3, atol=1e-3)


def test_vjp_linear_hash():
    check(HashGridSpec.create(num_levels=4, level_dim=2, base_resolution=4,
                              log2_hashmap_size=8))


def test_vjp_tiled():
    check(HashGridSpec.create(num_levels=3, level_dim=2, base_resolution=4,
                              log2_hashmap_size=7, gridtype="tiled"), seed=1)


def test_vjp_smoothstep_align():
    check(HashGridSpec.create(num_levels=3, level_dim=4, base_resolution=5,
                              log2_hashmap_size=9, align_corners=True,
                              interpolation="smoothstep"), seed=2)


def test_vjp_2d():
    check(HashGridSpec.create(input_dim=2, num_levels=4, level_dim=2,
                              base_resolution=8, log2_hashmap_size=10), seed=3)


def test_vjp_oob_zero_grads():
    spec = HashGridSpec.create(num_levels=2, level_dim=2, base_resolution=4,
                               log2_hashmap_size=8)
    x = jnp.asarray([[0.5, -0.2], [0.5, 0.5], [0.5, 0.5]], jnp.float32)  # 2nd OOB
    table = spec.init_table(jax.random.PRNGKey(0))

    def f(x, t):
        return hash_encode_cf_vjp(x, t, spec).sum()

    gx, gt = jax.grad(f, argnums=(0, 1))(x, table)
    assert float(jnp.abs(gx[:, 1]).sum()) == 0.0
