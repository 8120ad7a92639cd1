"""Loss functions, pure jnp.

Behavioral reference: torch-ngp `loss.py` (mape_loss:7, huber_loss:18,
EffDistLoss:30-76 — the O(N) mip-360 distortion loss).  The distortion loss
here relies on XLA autodiff of the cumsum formulation (its gradient equals the
reference's hand-written backward).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mape_loss(pred: jax.Array, target: jax.Array, reduction: str = "mean") -> jax.Array:
    loss = jnp.abs(pred - target) / (jnp.abs(target) + 1e-2)
    return loss.mean() if reduction == "mean" else loss


def huber_loss(
    pred: jax.Array, target: jax.Array, delta: float = 0.1, reduction: str = "mean"
) -> jax.Array:
    rel = jnp.abs(pred - target)
    sqr = 0.5 / delta * rel * rel
    loss = jnp.where(rel > delta, rel - 0.5 * delta, sqr)
    return loss.mean() if reduction == "mean" else loss


def eff_distloss(w: jax.Array, m: jax.Array, interval) -> jax.Array:
    """Efficient O(N) distortion loss over per-ray sample weights.

    w, m: [B, N] weights and midpoint distances; interval: scalar or [B, N].
    """
    wm = w * m
    w_prefix = jnp.cumsum(w, axis=-1) - w
    wm_prefix = jnp.cumsum(wm, axis=-1) - wm
    n_rays = w[..., 0].size
    loss_uni = (1.0 / 3.0) * interval * w**2
    loss_bi = 2.0 * w * (m * w_prefix - wm_prefix)
    return (loss_bi.sum() + loss_uni.sum()) / n_rays
