"""Exponential moving average of parameters.

Behavioral reference: torch_ema's ExponentialMovingAverage as used by the
trainers (`nerf/utils.py:333-335,1051-1052` updates per epoch; `sdf/utils.py:
349-350` updates per step).  Functional: ema state is a params-shaped pytree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_init(params):
    # real copies: the live params are donated into the train step, so the EMA
    # must not alias their buffers
    return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)


@jax.jit
def ema_update(ema_params, params, decay: float = 0.95):
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay), ema_params, params
    )
