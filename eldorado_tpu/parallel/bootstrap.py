"""Multi-process (multi-host) bootstrap: per-host env construction.

The single-controller path (`vec.vec_reset` + `mesh.shard_envs`)
materialises the FULL global batch on one process. On a pod that is both
redundant (every host would run procgen for all N envs) and wrong (a
process cannot device_put to another host's chips). Here each process
constructs only the env rows living on its addressable devices — env i is
seeded ``seed + i`` globally, exactly the reference's vec seeding
(reference: include/vec_environment.h:38-44, include/vec_sampler.h:9-13),
so a host owning rows [start, stop) runs ``vec_reset(seed + start,
stop - start, ...)`` locally — and the global sharded arrays are assembled
with `jax.make_array_from_process_local_data`.

Typical pod entry::

    from eldorado_tpu.parallel import bootstrap, mesh
    bootstrap.initialize()                  # jax.distributed.initialize
    m = mesh.make_mesh()                    # ("host","chip") over the pod
    states, rngs = bootstrap.vec_reset_distributed(m, seed=0, n_envs=65536)
    runner = ShardedRunner(m, 65536); runner.attach(states, rngs)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from .mesh import env_sharding


def initialize(coordinator_address=None, num_processes=None,
               process_id=None, **kwargs):
    """`jax.distributed.initialize` wrapper. A no-op when the process group
    is already initialised or when running single-process with no
    coordinator configured (the common local case)."""
    if jax.process_count() > 1:
        return  # already initialised
    import os
    if (coordinator_address is None and num_processes is None
            and "JAX_COORDINATOR_ADDRESS" not in os.environ
            and "COORDINATOR_ADDRESS" not in os.environ):
        # single-process local run: nothing to do
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kwargs)


def local_env_range(mesh: Mesh, n_envs: int) -> tuple[int, int]:
    """Global [start, stop) of the env-batch rows owned by THIS process
    under ``env_sharding(mesh)``. Requires the process's shards to be
    contiguous on the leading axis — true for `make_mesh`'s ("host",
    "chip") grid, whose host axis is the process dimension."""
    sharding = env_sharding(mesh)
    imap = sharding.devices_indices_map((n_envs,))
    spans = []
    for d, idx in imap.items():
        if d.process_index != jax.process_index():
            continue
        sl = idx[0]
        start = 0 if sl.start is None else sl.start
        stop = n_envs if sl.stop is None else sl.stop
        spans.append((start, stop))
    assert spans, "this process owns no shard of the env batch"
    spans.sort()
    start, stop = spans[0][0], spans[-1][1]
    covered = sum(b - a for a, b in spans)
    assert covered == stop - start, (
        f"non-contiguous per-process env shards: {spans}; build the mesh "
        "with make_mesh() so hosts map to the leading axis")
    return start, stop


def _assemble(mesh: Mesh, local_leaf, global_rows: int):
    """One local (rows, ...) leaf -> the global sharded jax.Array."""
    sharding = env_sharding(mesh)
    arr = np.asarray(local_leaf)
    return jax.make_array_from_process_local_data(
        sharding, arr, (global_rows,) + arr.shape[1:])


def vec_reset_distributed(mesh: Mesh, seed, n_envs: int, n_players=4,
                          n_pieces=3, difficulty=0, max_steps=100000,
                          sampler_seed=42, check_maps=True):
    """Per-host `vec_cog_env::reset` + sampler seeding over the mesh:
    process-local procgen of this host's rows only, assembled into global
    sharded (states, sampler_rngs). Bit-identical to the single-controller
    ``shard_envs(vec_reset(seed, n_envs, ...), mesh)`` for every mesh
    shape (tests/test_bootstrap.py)."""
    from ..vec import _vec_reset, check_map_generation, sampler_init

    start, stop = local_env_range(mesh, n_envs)
    local = _vec_reset(int(seed) + start, stop - start, n_players,
                       n_pieces, difficulty, max_steps)
    if check_maps:
        check_map_generation(local)   # host-local raise, like the reference
    states = jax.tree_util.tree_map(
        lambda x: _assemble(mesh, x, n_envs), local)
    local_rngs = sampler_init(int(sampler_seed) + start, stop - start)
    rngs = _assemble(mesh, local_rngs, n_envs)
    return states, rngs
