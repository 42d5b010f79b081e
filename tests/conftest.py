"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Sharding tests need multiple devices; parity math is platform-independent.
Must run before jax initializes its backends.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()


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
