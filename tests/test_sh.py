"""SH encoder vs an independent hardcoded degree-4 oracle + gradient checks.

Oracle polynomials follow the same graphics convention as the reference's
pure-torch SHEncoder_torch (testing/test_shencoder.py:8-50).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.test_util import check_grads

from tngp.ops import sh_encode

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = [1.0925484305920792, -1.0925484305920792, 0.31539156525252005, -1.0925484305920792, 0.5462742152960396]
C3 = [-0.5900435899266435, 2.890611442640554, -0.4570457994644658, 0.3731763325901154,
      -0.4570457994644658, 1.445305721320277, -0.5900435899266435]
C4 = [2.5033429417967046, -1.7701307697799304, 0.9461746957575601, -0.6690465435572892,
      0.10578554691520431, -0.6690465435572892, 0.47308734787878004, -1.7701307697799304,
      0.6258357354491761]


def sh4_oracle(d):
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    out = np.stack(
        [
            np.full_like(x, C0),
            -C1 * y, C1 * z, -C1 * x,
            C2[0] * xy, C2[1] * yz, C2[2] * (2.0 * zz - xx - yy), C2[3] * xz, C2[4] * (xx - yy),
            C3[0] * y * (3 * xx - yy), C3[1] * xy * z, C3[2] * y * (4 * zz - xx - yy),
            C3[3] * z * (2 * zz - 3 * xx - 3 * yy), C3[4] * x * (4 * zz - xx - yy),
            C3[5] * z * (xx - yy), C3[6] * x * (xx - 3 * yy),
        ],
        axis=-1,
    )
    return out


def unit_dirs(rng, n):
    d = rng.normal(size=(n, 3))
    return (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)


def test_sh_degree4_matches_oracle(rng):
    d = unit_dirs(rng, 256)
    got = np.asarray(sh_encode(jnp.asarray(d), degree=4))
    want = sh4_oracle(d)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sh_all_degrees_shapes(rng):
    d = unit_dirs(rng, 8)
    for deg in range(1, 9):
        out = sh_encode(jnp.asarray(d), degree=deg)
        assert out.shape == (8, deg * deg)
        assert np.isfinite(np.asarray(out)).all()


def test_sh_orthonormality(rng):
    # Monte-Carlo check: int Y_i Y_j dOmega = delta_ij  (validates degrees 5..8
    # where we have no hardcoded oracle).
    d = unit_dirs(np.random.default_rng(0), 400_000)
    Y = np.asarray(sh_encode(jnp.asarray(d), degree=6))  # [N, 36]
    G = (Y.T @ Y) / d.shape[0] * (4 * np.pi)
    np.testing.assert_allclose(G, np.eye(36), atol=0.15)


def test_sh_grads(rng):
    d = jnp.asarray(unit_dirs(rng, 16))
    check_grads(lambda x: sh_encode(x, degree=4).sum(), (d,), order=1, modes=["rev"], atol=1e-2, rtol=1e-2)
