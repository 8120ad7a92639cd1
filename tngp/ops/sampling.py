"""Hierarchical (inverse-CDF) importance sampling, pure jnp.

Behavioral reference: torch-ngp `nerf/renderer.py:12-46` (sample_pdf).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("n_samples", "det"))
def sample_pdf(
    bins: jax.Array,  # [B, T] bin edges (old z_vals)
    weights: jax.Array,  # [B, T-1]
    n_samples: int,
    det: bool = False,
    key: jax.Array | None = None,
) -> jax.Array:
    """Returns [B, n_samples] new z values drawn from the weight histogram."""
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [B, T]

    B, T = cdf.shape
    if det:
        u = jnp.linspace(0.5 / n_samples, 1.0 - 0.5 / n_samples, n_samples)
        u = jnp.broadcast_to(u, (B, n_samples))
    else:
        if key is None:
            raise ValueError("key required when det=False")
        u = jax.random.uniform(key, (B, n_samples))

    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, T - 1)

    cdf_below = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_above = jnp.take_along_axis(cdf, above, axis=-1)
    bins_below = jnp.take_along_axis(bins, below, axis=-1)
    bins_above = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)
