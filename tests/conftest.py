"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Sharding tests need multiple devices; parity math is platform-independent.
Must run before jax initializes its backends. The axon TPU plugin registers
itself from sitecustomize whenever PALLAS_AXON_POOL_IPS is set and overrides
JAX_PLATFORMS, so it must be cleared too — otherwise the whole suite silently
runs through the single-chip TPU tunnel.
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
