"""Activations with custom gradients.

Behavioral reference: torch-ngp `activation.py:5-18` (`_trunc_exp`): forward is
`exp(x)`, backward uses `exp(clamp(x, -15, 15))` so half/bf16 training does not
overflow through the density head.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x: jax.Array) -> jax.Array:
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)
