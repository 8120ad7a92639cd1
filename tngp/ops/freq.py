"""NeRF positional (frequency) encoding, pure jnp.

Behavioral reference: torch-ngp `freqencoder/src/freqencoder.cu` and the
pure-torch fallback `encoding.py:5-43` (FreqEncoder_torch): output layout is
`[x, sin(f0 x), cos(f0 x), sin(f1 x), cos(f1 x), ...]` concatenated over dims,
with `f_i = 2^i` for `degree` octaves.  output_dim = D * (1 + 2*degree).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("degree",))
def freq_encode(x: jax.Array, degree: int = 4) -> jax.Array:
    """`[..., D]` -> `[..., D * (1 + 2*degree)]`."""
    outs = [x]
    for i in range(degree):
        xi = x * (2.0**i)
        outs.append(jnp.sin(xi))
        outs.append(jnp.cos(xi))
    return jnp.concatenate(outs, axis=-1)


def freq_output_dim(input_dim: int, degree: int) -> int:
    return input_dim * (1 + 2 * degree)
