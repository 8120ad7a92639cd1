"""Test config: force CPU backend with 8 virtual devices (the "fake cluster").

NOTE: in this environment the experimental 'axon' TPU plugin ignores the
JAX_PLATFORMS env var, so we must use jax.config.update('jax_platforms', ...)
*before* any backend is initialized.  XLA_FLAGS must still be set before jax
import for the virtual device count to take effect.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture
def rng():
    import numpy as np

    return np.random.default_rng(42)


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", (
        "tests must run on the virtual CPU mesh, got " + jax.default_backend()
    )
    assert len(jax.devices()) == 8


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Bound per-worker XLA state growth under xdist.

    Long-lived workers accumulate compiled executables across every module
    they run; the round-2/3 flaky gw3 segfault in the heaviest trainer test
    only reproduces with a full-suite worker history (the test passes alone
    and in small groups).  Dropping caches between modules keeps each
    module's compile arena fresh at the cost of a few intra-module recompiles."""
    yield
    jax.clear_caches()
