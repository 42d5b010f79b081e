#!/usr/bin/env python3
"""XLA TPU gather cost model: per-element vs per-row, with a real barrier.

The blocked rollout's per-step map read is a dependent gather of 4 i32
words per env (16K elements at 4096 envs) measured at ~200 us/step — the
single largest term in the step. This probe times gathers of R rows x W
contiguous words to establish whether cost scales with elements or rows,
deciding the table layout (tools/tpu_true_step_cost.py for the barrier
caveats).

    python tools/tpu_gather_model.py
"""
import argparse
import functools
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

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ["JAX_COMPILATION_CACHE_DIR"])

import jax.numpy as jnp
import numpy as np


def build(n_rows, width, table_rows, mode, steps):
    @jax.jit
    def run(tab, idx0):
        def body(c, _):
            idx = (idx0 + c) % table_rows
            if mode == "flat":
                # scalar-element gather: (n_rows*width,) indices
                flat = tab.reshape(-1)
                gidx = (idx[:, None] * width
                        + jnp.arange(width, dtype=jnp.int32)[None, :])
                g = flat.at[gidx.reshape(-1)].get(
                    mode="promise_in_bounds").reshape(n_rows, width)
            elif mode == "row":
                # row gather: n_rows indices, W contiguous words each
                g = tab.at[idx].get(mode="promise_in_bounds")
            elif mode == "dots":
                # rank-3 blocked layout like the real rollout
                nb = n_rows // 512
                flat = tab.reshape(-1)
                gidx = (idx.reshape(nb, 1, 512) * width
                        + jnp.arange(width, dtype=jnp.int32)[None, :, None])
                g = flat.at[gidx].get(mode="promise_in_bounds")
                g = jnp.moveaxis(g, 1, 2).reshape(n_rows, width)
            return c + jnp.sum(g) % 7 + 1, None
        c, _ = jax.lax.scan(body, jnp.int32(0), None, length=steps)
        return c
    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--s1", type=int, default=100)
    ap.add_argument("--s2", type=int, default=400)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    print("devices:", jax.devices(), flush=True)
    TABLE_ROWS = 4096 * 2304 // 8   # ~1.2M rows: out-of-VMEM like the real tab
    rng = np.random.default_rng(0)

    for n_rows, width in ((16384, 1), (4096, 4), (4096, 1), (4096, 8),
                          (2048, 8), (8192, 2), (4096, 16), (4096, 128)):
        tab = jnp.asarray(
            rng.integers(0, 1 << 20, (TABLE_ROWS, width)), jnp.int32)
        for mode in ("flat", "row", "dots"):
            if mode == "dots" and n_rows % 512:
                continue
            run = build(n_rows, width, TABLE_ROWS, mode, args.s1)
            run2 = build(n_rows, width, TABLE_ROWS, mode, args.s2)

            def timed(r):
                i = jnp.asarray(rng.integers(0, TABLE_ROWS, n_rows),
                                jnp.int32)
                np.asarray(jnp.sum(i))
                t0 = time.perf_counter()
                np.asarray(r(tab, i))
                return time.perf_counter() - t0

            timed(run), timed(run2)
            t1 = min(timed(run) for _ in range(args.reps))
            t2 = min(timed(run2) for _ in range(args.reps))
            per = (t2 - t1) / (args.s2 - args.s1)
            print(f"rows {n_rows:6d} x{width:4d}  {mode:5s} "
                  f"per-gather {per*1e6:8.2f} us  "
                  f"({per/n_rows*1e9:6.2f} ns/row, "
                  f"{per/(n_rows*width)*1e9:6.2f} ns/elem)", flush=True)


if __name__ == "__main__":
    main()
