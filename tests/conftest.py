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
import resource

# The XLA CPU compiler's recursive passes can overflow the default 8 MB
# main-thread stack when compiling the largest fused programs (the
# shard_map'd rollout scan) late in a long single-process suite —
# observed as a deterministic SIGSEGV/SIGABRT inside
# backend_compile_and_load. Linux grows the main stack on demand up to
# RLIMIT_STACK, so raising the soft limit to the hard limit prevents it.
try:
    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))
except (ValueError, OSError):
    pass

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
# sitecustomize imports jax at interpreter startup, BEFORE this conftest
# (or any tool) can set JAX_COMPILATION_CACHE_DIR in the environment —
# so the env var alone never takes effect and every process recompiles
# everything (measured: the suite's heaviest tests are compile-bound and
# the cache dir stayed empty for three rounds). Setting the config
# directly after import is what actually enables the persistent cache.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ["JAX_COMPILATION_CACHE_DIR"])
from jax._src import xla_bridge as _xb  # noqa: E402

_xb._clear_backends()


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running parity replays")


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_xla_cpu_client_state():
    """Drop compiled executables between test MODULES.

    A single long pytest process accumulates hundreds of XLA CPU
    executables; past a threshold the CPU client's compiler begins to
    SIGSEGV/SIGABRT on otherwise-fine programs (observed twice at
    different, individually-green compile sites; every module passes in
    its own process). Clearing JAX's in-memory caches per module bounds
    that state — recompiles across modules come from the on-disk
    compilation cache, so the cost is seconds."""
    yield
    import jax

    jax.clear_caches()
    # module-level caches holding compiled programs
    from eldorado_tpu import vec as _vec
    from eldorado_tpu.parallel import runner as _runner
    _vec._KERNEL_CACHE.clear()
    _runner._sharded_kernel_programs.cache_clear()
    _runner._build_rollout.cache_clear()
    _runner._build_sample.cache_clear()
    _runner._build_step.cache_clear()


def pytest_collection_modifyitems(config, items):
    if config.getoption("-m", default=""):
        return
    import pytest
    skip = pytest.mark.skip(reason="slow: run with -m slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
