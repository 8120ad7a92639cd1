"""Hash-grid encoder vs an independent per-point numpy simulator of the CUDA
semantics (gridencoder.cu kernel_grid / get_grid_index / fast_hash), plus
gradient checks."""

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.test_util import check_grads

from tngp.ops import HashGridSpec, hash_encode

PRIMES = [1, 2654435761, 805459861, 3674653429, 2097192037, 1434869437, 2165219737]
U32 = 1 << 32


def ref_encode(x, table, spec: HashGridSpec):
    """Scalar-loop reference following gridencoder.cu line by line."""
    B = x.shape[0]
    D, L, C = spec.input_dim, spec.num_levels, spec.level_dim
    offsets = spec.offsets
    out = np.zeros((B, L, C), dtype=np.float64)
    S = math.log2(spec.per_level_scale)
    H = spec.base_resolution
    for b in range(B):
        if np.any(x[b] < 0) or np.any(x[b] > 1):
            continue
        for l in range(L):
            hashmap_size = offsets[l + 1] - offsets[l]
            scale = 2.0 ** (l * S) * H - 1.0
            res = int(np.ceil(scale)) + 1
            pos = x[b] * scale + (0.0 if spec.align_corners else 0.5)
            pg = np.floor(pos).astype(np.int64)
            frac = pos - pg
            if spec.interpolation == "smoothstep":
                frac = frac * frac * (3 - 2 * frac)
            for corner in range(1 << D):
                w = 1.0
                cc = np.zeros(D, dtype=np.int64)
                for d in range(D):
                    if (corner >> d) & 1:
                        w *= frac[d]
                        cc[d] = pg[d] + 1
                    else:
                        w *= 1 - frac[d]
                        cc[d] = pg[d]
                # get_grid_index
                side = res if spec.align_corners else res + 1
                index = 0
                stride = 1
                for d in range(D):
                    if stride > hashmap_size:
                        break
                    index = (index + cc[d] * stride) % U32
                    stride *= side
                if spec.gridtype == "hash" and stride > hashmap_size:
                    index = 0
                    for d in range(D):
                        index ^= (cc[d] * PRIMES[d]) % U32
                        index %= U32
                index = index % hashmap_size + offsets[l]
                out[b, l] += w * table[index]
    return out.reshape(B, L * C)


def run_case(spec, rng, B=64):
    x = rng.uniform(0, 1, size=(B, spec.input_dim)).astype(np.float32)
    x[0] = -0.5  # out-of-bounds point -> zeros
    key = jax.random.PRNGKey(0)
    table = np.asarray(spec.init_table(key)) * 1e4  # scale up for tolerance
    got = np.asarray(hash_encode(jnp.asarray(x), jnp.asarray(table), spec))
    want = ref_encode(x.astype(np.float64), table.astype(np.float64), spec)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
    assert np.all(got[0] == 0.0)


def test_hash_small_dense_and_hashed(rng):
    # small table forces the hash branch at upper levels; dense at lower
    spec = HashGridSpec.create(num_levels=4, level_dim=2, base_resolution=4,
                               log2_hashmap_size=8, per_level_scale=2.0)
    run_case(spec, rng)


def test_tiled(rng):
    spec = HashGridSpec.create(num_levels=4, level_dim=2, base_resolution=4,
                               log2_hashmap_size=8, gridtype="tiled")
    run_case(spec, rng)


def test_align_corners_and_smoothstep(rng):
    spec = HashGridSpec.create(num_levels=3, level_dim=4, base_resolution=5,
                               log2_hashmap_size=7, align_corners=True,
                               interpolation="smoothstep")
    run_case(spec, rng)


def test_ngp_default_spec_shapes():
    spec = HashGridSpec.create(num_levels=16, level_dim=2, base_resolution=16,
                               log2_hashmap_size=19, desired_resolution=2048)
    assert spec.output_dim == 32
    assert spec.total_params > 2**19  # lower dense levels + capped upper levels
    x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (32, 3)), dtype=jnp.float32)
    table = spec.init_table(jax.random.PRNGKey(0))
    out = hash_encode(x, table, spec)
    assert out.shape == (32, 32)


def test_hashgrid_grads_table(rng):
    spec = HashGridSpec.create(num_levels=4, level_dim=2, base_resolution=4,
                               log2_hashmap_size=8)
    x = jnp.asarray(rng.uniform(0.05, 0.95, size=(16, 3)), dtype=jnp.float32)
    table = spec.init_table(jax.random.PRNGKey(0))
    check_grads(lambda t: (hash_encode(x, t, spec) ** 2).sum(), (table,),
                order=1, modes=["rev"], atol=1e-2, rtol=1e-2)


def test_hashgrid_grads_inputs(rng):
    # points away from cell boundaries so fp32 numerical diff is clean
    spec = HashGridSpec.create(num_levels=2, level_dim=2, base_resolution=4,
                               log2_hashmap_size=8)
    x = (np.floor(rng.uniform(0, 3, size=(8, 3))) + 0.43) / 4.0
    x = jnp.asarray(x, dtype=jnp.float32)
    table = spec.init_table(jax.random.PRNGKey(0))
    check_grads(lambda xx: (hash_encode(xx, table, spec) ** 2).sum(), (x,),
                order=1, modes=["rev"], atol=2e-2, rtol=2e-2)


def test_tv_grad(rng):
    from tngp.ops import hash_encode_tv_grad

    spec = HashGridSpec.create(num_levels=2, level_dim=2, base_resolution=4,
                               log2_hashmap_size=8)
    table = jnp.asarray(rng.normal(size=(spec.total_params, 2)), jnp.float32)
    x = jnp.asarray(rng.uniform(0.1, 0.9, (32, 3)), jnp.float32)
    g = hash_encode_tv_grad(x, table, spec, weight=1e-3)
    assert g.shape == table.shape
    assert float(jnp.abs(g).sum()) > 0
    # TV gradient of a constant table is zero
    g0 = hash_encode_tv_grad(x, jnp.ones_like(table), spec, weight=1e-3)
    np.testing.assert_allclose(np.asarray(g0), 0.0, atol=1e-7)
