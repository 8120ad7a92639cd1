"""Importing tngp must not initialize any JAX backend.

A module-level jnp constant once initialized the default (axon) backend at
import time — before CLIs could force TNGP_PLATFORM=cpu — which hung every
tngp import whenever the TPU tunnel was unreachable.  This guard imports the
whole package tree in a clean subprocess and asserts no backend exists.
"""

import subprocess
import sys

CHECK = r"""
import pkgutil

import tngp

mods = [
    name for _, name, _ in pkgutil.walk_packages(tngp.__path__, "tngp.")
    if "libmeshops" not in name  # ctypes .so, not an importable python module
]
for m in mods:
    __import__(m)

import jax._src.xla_bridge as xb

backends = getattr(xb, "_backends", {})
assert not backends, f"import initialized backends: {list(backends)}"
print("import hygiene ok:", len(mods), "modules")
"""


def test_no_backend_init_on_import():
    r = subprocess.run(
        [sys.executable, "-c", CHECK], capture_output=True, text=True, timeout=300
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "import hygiene ok" in r.stdout
