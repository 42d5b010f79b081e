#!/usr/bin/env python3
"""XLA TPU gather cost scaling: elements vs indices vs slice width.

All variants gather from a flat i32 table with live (carry-perturbed)
indices inside a 100-step scan, 4096 envs, blocked (nb, p, block) index
layout. Establishes whether the fused-step rollout should fetch per-cell
(76/env), per-player rows (4/env x 5 i32) or carried rows (1/env x 5 i32).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 ".jax_cache_tpu"))

import jax
import jax.numpy as jnp
import numpy as np

N = 4096
BLOCK = 256
NB = N // BLOCK
T = 100
M = N * 2305


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / T


def bench_flat(p, reps, label):
    """reps x flat gathers, index shape (NB, p, BLOCK)."""
    table = jnp.asarray(np.random.default_rng(0).integers(0, 1 << 20, M, dtype=np.int32))
    seed = jnp.arange(NB * p * BLOCK, dtype=jnp.int32).reshape(NB, p, BLOCK)

    @jax.jit
    def run(table, seed):
        def body(carry, _):
            s, acc = carry
            s = s * 75 + 74
            idx = (s & 0x7FFFFF) % M
            for _ in range(reps):
                g = table.at[idx].get(mode="promise_in_bounds")
                acc = acc + g.sum(dtype=jnp.int32)
                idx = idx + 1
            s = s + (acc & 1)  # serialize: next idx depends on this gather
            return (s, acc), None
        (s, acc), _ = jax.lax.scan(
            body, (seed, jnp.zeros((), jnp.int32)), None, length=T)
        return acc
    t = timeit(run, table, seed)
    n_elem = NB * p * BLOCK * reps
    print(f"{label:28s}: {t*1e6:8.1f} us/step  ({n_elem:7d} elem, "
          f"{t/n_elem*1e9:6.2f} ns/elem)", flush=True)


def bench_slice(p, w, label):
    """one gather, index shape (NB, p, BLOCK), slice width w (rows)."""
    table = jnp.asarray(np.random.default_rng(0).integers(0, 1 << 20, (M, w), dtype=np.int32))
    seed = jnp.arange(NB * p * BLOCK, dtype=jnp.int32).reshape(NB, p, BLOCK)

    @jax.jit
    def run(table, seed):
        def body(carry, _):
            s, acc = carry
            s = s * 75 + 74
            idx = (s & 0x7FFFFF) % M
            g = table.at[idx].get(mode="promise_in_bounds")  # (...,w)
            acc = acc + g.sum(dtype=jnp.int32)
            s = s + (acc & 1)  # serialize: next idx depends on this gather
            return (s, acc), None
        (s, acc), _ = jax.lax.scan(
            body, (seed, jnp.zeros((), jnp.int32)), None, length=T)
        return acc
    t = timeit(run, table, seed)
    n_idx = NB * p * BLOCK
    print(f"{label:28s}: {t*1e6:8.1f} us/step  ({n_idx:7d} idx x {w}, "
          f"{t/n_idx/w*1e9:6.2f} ns/elem)", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    bench_flat(4, 19, "A 76/env cells (now)")
    bench_flat(4, 5, "B 20/env row-words")
    bench_flat(1, 5, "C 5/env carried-row words")
    bench_flat(1, 1, "D 1/env single word")
    bench_slice(4, 5, "E 4/env idx, slice w=5")
    bench_slice(1, 5, "F 1/env idx, slice w=5")
    bench_slice(1, 19, "G 1/env idx, slice w=19")


if __name__ == "__main__":
    main()
