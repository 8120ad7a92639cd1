"""Encoder factory parity + freq encoder + color conversions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tngp.encoders import get_encoder
from tngp.ops import freq_encode, freq_output_dim
from tngp.utils.colors import linear_to_srgb, srgb_to_linear


def test_factory_names():
    enc, dim = get_encoder("None", input_dim=3)
    assert dim == 3
    enc, dim = get_encoder("frequency", multires=6)
    assert dim == 3 * (1 + 2 * 6)
    enc, dim = get_encoder("sphere_harmonics", degree=4)
    assert dim == 16
    enc, dim = get_encoder("hashgrid")
    assert dim == 32
    enc, dim = get_encoder("tiledgrid")
    assert dim == 32
    with pytest.raises(NotImplementedError):
        get_encoder("hashgrid_minkowski_hierarchical")
    with pytest.raises(ValueError):
        get_encoder("bogus")


def test_freq_encoding_layout(rng):
    x = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
    out = np.asarray(freq_encode(x, degree=2))
    assert out.shape == (8, freq_output_dim(3, 2))
    xn = np.asarray(x)
    np.testing.assert_allclose(out[:, :3], xn, rtol=1e-6)
    np.testing.assert_allclose(out[:, 3:6], np.sin(xn), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out[:, 6:9], np.cos(xn), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out[:, 9:12], np.sin(2 * xn), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out[:, 12:15], np.cos(2 * xn), rtol=1e-5, atol=1e-6)


def test_srgb_roundtrip(rng):
    x = rng.uniform(0, 1, 256).astype(np.float64)
    y = linear_to_srgb(srgb_to_linear(x))
    np.testing.assert_allclose(y, x, atol=1e-5)
    # spot values
    np.testing.assert_allclose(srgb_to_linear(np.float64(0.5)), 0.21404114, rtol=1e-5)
