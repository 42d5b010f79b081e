"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Sharding tests need multiple devices; parity math is platform-independent.
The axon TPU plugin registers itself from sitecustomize at *interpreter
startup* (it imports jax before any conftest runs) whenever
PALLAS_AXON_POOL_IPS is set, and pins JAX_PLATFORMS=axon — so simply setting
env vars here is too late. Instead: update the config, drop any
already-initialized backends, and let the CPU client re-initialize lazily
with the virtual-device flag.
"""
import os

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
from jax._src import xla_bridge as _xb  # noqa: E402

_xb._clear_backends()


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running parity replays")


def pytest_collection_modifyitems(config, items):
    if config.getoption("-m", default=""):
        return
    import pytest
    skip = pytest.mark.skip(reason="slow: run with -m slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
