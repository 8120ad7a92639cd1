"""Shared network building blocks.

TPU layout convention: hot-path activations are *channels-first* `[F, B]` —
the batch dimension rides the 128-lane axis, so narrow feature dims (3, 16,
32, 64) never become the padded minor dimension.  See ops/hashgrid.py.
"""

from __future__ import annotations

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp


def _torch_linear_init(key, shape, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch nn.Linear default, for init
    parity with the reference MLPs (nerf/network.py uses default init)."""
    fan_in = shape[0]
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


class MLP(nn.Module):
    """Bias-free ReLU MLP, the torch-ngp workhorse (FFMLP/nn.Linear stacks are
    always bias=False, e.g. nerf/network.py:70, ffmlp/ffmlp.py).

    Kernels are stored `[fan_in, fan_out]`.  `__call__` takes batch-first
    `[..., F]`; `cf` takes channels-first `[F, B]` and keeps B minor.
    `compute_dtype=bfloat16` runs the matmul chain on the MXU in bf16 while
    params stay fp32 (replaces the reference's fp16 autocast + GradScaler).
    """

    hidden_dim: int
    output_dim: int
    num_layers: int
    compute_dtype: jnp.dtype = jnp.float32

    def _kernels(self, in_dim: int):
        ks = []
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            ks.append(self.param(f"dense_{i}", _torch_linear_init, (in_dim, out)))
            in_dim = out
        return ks

    def __call__(self, x: jax.Array) -> jax.Array:
        prefix = x.shape[:-1]
        out = self.cf(x.reshape(-1, x.shape[-1]).T)
        return out.T.reshape(*prefix, self.output_dim)

    @nn.compact
    def cf(self, x_cf: jax.Array) -> jax.Array:
        """`[F, B]` -> `[output_dim, B]`."""
        h = x_cf.astype(self.compute_dtype)
        for i, k in enumerate(self._kernels(x_cf.shape[0])):
            h = jnp.einsum(
                "io,ib->ob", k.astype(self.compute_dtype), h,
                preferred_element_type=self.compute_dtype,
                # bf16 compute opts into single-pass MXU semantics; f32
                # compute must NOT pin DEFAULT (TPU would silently round
                # operands to bf16 — the device-only portability failure the
                # package-wide float32 matmul default exists to prevent)
                precision=(jax.lax.Precision.DEFAULT
                           if self.compute_dtype == jnp.bfloat16 else None),
            )
            if i != self.num_layers - 1:
                h = nn.relu(h)
        return h
