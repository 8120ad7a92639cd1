"""Real spherical-harmonics direction encoding (degrees 1..8), pure jnp.

Behavioral reference: torch-ngp `shencoder/src/shencoder.cu` (hardcoded
polynomial expansion) and the pure-torch oracle `testing/test_shencoder.py:8-50`
(graphics convention with Condon-Shortley phase folded into P_l^m, components
ordered by index l^2 + l + m).

Instead of hardcoding several hundred polynomial terms like the CUDA kernel, we
*generate* the same polynomials at trace time from the standard recurrences, in
fully Cartesian form (no trig, differentiable everywhere):

  C_m + i S_m = (x + i y)^m                      (azimuthal part, sin^m(theta) folded in)
  Pb_m^m      = (-1)^m (2m-1)!!                  (CS phase)
  Pb_{m+1}^m  = (2m+1) z Pb_m^m
  Pb_l^m      = ((2l-1) z Pb_{l-1}^m - (l+m-1) Pb_{l-2}^m) / (l - m)
  y_{l,+-m}   = sqrt(2) K_l^m {C_m | S_m} Pb_l^m,   y_{l,0} = K_l^0 Pb_l^0
  K_l^m       = sqrt((2l+1)/(4 pi) * (l-m)!/(l+m)!)

XLA constant-folds the coefficients; the emitted code is the same fused
polynomial chain the CUDA kernel hardcodes.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def _K(l: int, m: int) -> float:
    return math.sqrt(
        (2 * l + 1) / (4 * math.pi) * math.factorial(l - m) / math.factorial(l + m)
    )


@partial(jax.jit, static_argnames=("degree",))
def sh_encode_cf(d_cf: jax.Array, degree: int = 4) -> jax.Array:
    """Channels-first encode: `[3, B]` unit directions -> `[degree**2, B]`.

    Component i = l^2 + l + m like the reference; batch stays the minor (lane)
    dimension throughout — see ops/hashgrid.py for the TPU layout rationale.
    """
    if not (1 <= degree <= 8):
        raise ValueError(f"degree must be in [1, 8], got {degree}")
    x, y, z = d_cf[0], d_cf[1], d_cf[2]
    dtype = d_cf.dtype
    xf, yf, zf = x.astype(jnp.float32), y.astype(jnp.float32), z.astype(jnp.float32)

    # Azimuthal ladder: C[m] = Re((x+iy)^m), S[m] = Im((x+iy)^m)
    C = [jnp.ones_like(xf)]
    S = [jnp.zeros_like(xf)]
    for m in range(1, degree):
        C.append(xf * C[m - 1] - yf * S[m - 1])
        S.append(xf * S[m - 1] + yf * C[m - 1])

    # Scaled associated Legendre Pb[m][l] (polynomial in z, CS phase included)
    Pb: dict[tuple[int, int], jax.Array] = {}
    for m in range(degree):
        pmm = ((-1.0) ** m) * math.prod(range(1, 2 * m, 2)) if m > 0 else 1.0
        Pb[(m, m)] = jnp.full_like(zf, float(pmm)) if m > 0 else jnp.ones_like(zf)
        if m + 1 < degree:
            Pb[(m + 1, m)] = (2 * m + 1) * zf * Pb[(m, m)]
        for l in range(m + 2, degree):
            Pb[(l, m)] = ((2 * l - 1) * zf * Pb[(l - 1, m)] - (l + m - 1) * Pb[(l - 2, m)]) / (
                l - m
            )

    out = [None] * (degree * degree)
    sqrt2 = math.sqrt(2.0)
    for l in range(degree):
        out[l * l + l] = _K(l, 0) * Pb[(l, 0)]
        for m in range(1, l + 1):
            k = sqrt2 * _K(l, m)
            out[l * l + l + m] = k * C[m] * Pb[(l, m)]
            out[l * l + l - m] = k * S[m] * Pb[(l, m)]
    return jnp.stack(out, axis=0).astype(dtype)


def sh_encode(dirs: jax.Array, degree: int = 4) -> jax.Array:
    """Batch-first wrapper: `[..., 3]` -> `[..., degree**2]`."""
    prefix = dirs.shape[:-1]
    out = sh_encode_cf(dirs.reshape(-1, 3).T, degree)
    return out.T.reshape(*prefix, degree * degree)
