"""Color space conversions (reference nerf/utils.py:42-49).

Written with pure operators so they work on numpy and jax arrays alike.
"""

from __future__ import annotations


def srgb_to_linear(x):
    lo = x <= 0.04045
    return (x / 12.92) * lo + (((x + 0.055) / 1.055) ** 2.4) * (1 - lo)


def linear_to_srgb(x):
    eps = 1e-8
    lo = x <= 0.0031308
    hi = 1 - lo
    safe = x * hi + eps * lo  # avoid pow of negatives/zero on the unused branch
    return (12.92 * x) * lo + (1.055 * safe ** (1 / 2.4) - 0.055) * hi
