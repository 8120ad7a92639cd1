"""SDF field network.

Behavioral reference: torch-ngp `sdf/netowrk.py:8-62` (sic): hash-grid encode
(num_levels 16, level_dim 2, base 16, log2 19, desired resolution 2048) ->
3-layer 64-wide bias-free MLP -> scalar signed distance.  `clip_sdf` optionally
clamps the output (netowrk.py:57-60).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..encoders import get_encoder
from .common import MLP


class SDFNetwork(nn.Module):
    encoding: str = "hashgrid"
    num_layers: int = 3
    hidden_dim: int = 64
    clip_sdf: float | None = None
    compute_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder, self.in_dim = get_encoder(self.encoding, desired_resolution=2048)
        self.backbone = MLP(
            hidden_dim=self.hidden_dim,
            output_dim=1,
            num_layers=self.num_layers,
            compute_dtype=self.compute_dtype,
        )

    def cf(self, x_cf: jax.Array) -> jax.Array:
        """x_cf: [3, B] in [-1, 1] -> sdf [1, B] (channels-first hot path)."""
        h = self.encoder.cf(x_cf, bound=1.0)
        h = self.backbone.cf(h).astype(jnp.float32)
        if self.clip_sdf is not None:
            h = jnp.clip(h, -self.clip_sdf, self.clip_sdf)
        return h

    def __call__(self, x: jax.Array) -> jax.Array:
        """x: [..., 3] in [-1, 1] -> sdf [..., 1]"""
        prefix = x.shape[:-1]
        return self.cf(x.reshape(-1, 3).T).T.reshape(*prefix, 1)
