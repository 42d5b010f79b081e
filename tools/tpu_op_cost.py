#!/usr/bin/env python3
"""Per-op cost model probe for Mosaic step-kernel shapes.

The fused step kernel is ~3k vector ops; whether its cost is per-op issue,
per-vreg, or layout-dependent decides which node-reduction lever pays.
This probe times a Pallas kernel whose body is K data-dependent int32 ops
on one operand shape, for several shapes/layouts (env axis last, like the
real kernel).

Measurement notes (this environment):
* the axon tunnel memoises identical dispatches — every timed call uses
  fresh input values;
* ``jax.block_until_ready`` does NOT synchronise through the tunnel — a
  host materialisation (np.asarray of a reduced scalar) is the only real
  barrier, costing ~25 ms fixed;
* both effects are cancelled by differencing two step counts:
  cost = (t(S2) - t(S1)) / (S2 - S1) per kernel call, then differencing
  a K-op and a 2-op kernel for the per-op slope.

Usage: python tools/tpu_op_cost.py [--k 4096]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 ".jax_cache_tpu"))

import functools

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ["JAX_COMPILATION_CACHE_DIR"])

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def build(shape, k, op):
    # two mutually-dependent values so nothing folds; 2 ops per iter
    def kernel(x_ref, y_ref, o_ref):
        v = x_ref[...]
        w = y_ref[...]
        for i in range(k // 2):
            if op == "add":
                v = v + w
                w = w ^ v
            else:
                v = jnp.where((v & 3) > 1, v + w, v - w)
                w = w ^ (v >> 1)
        o_ref[...] = v + w

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    @functools.partial(jax.jit, static_argnums=(2,))
    def run(x, y, steps):
        def body(c, _):
            return call(c, y), None
        z, _ = jax.lax.scan(body, x, None, length=steps)
        return jnp.sum(z)
    return run


def _time(run, shape, steps, rng, reps=3):
    ts = []
    for _ in range(reps):
        x = jnp.asarray(rng.integers(1, 1000, shape), jnp.int32)
        y = jnp.asarray(rng.integers(1, 1000, shape), jnp.int32)
        np.asarray(x.sum() + y.sum())   # land inputs
        t0 = time.perf_counter()
        np.asarray(run(x, y, steps))    # the only real barrier
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--op", default="add")
    ap.add_argument("--s1", type=int, default=100)
    ap.add_argument("--s2", type=int, default=400)
    ap.add_argument("--shapes", default="")
    args = ap.parse_args()
    k, s1, s2 = args.k, args.s1, args.s2
    print("devices:", jax.devices(), flush=True)

    b = 512
    shapes = [(b,), (1, b), (8, b // 8), (3, b), (21, b), (92, b),
              (4096,), (8, 512), (32, b)]
    if args.shapes:
        shapes = [tuple(int(d) for d in s.split("x"))
                  for s in args.shapes.split(",")]
    rng = np.random.default_rng(0)
    for shape in shapes:
        per = {}
        for kk in (2, k):
            run = build(shape, kk, args.op)
            _time(run, shape, 2, rng, reps=1)      # compile both step counts
            _time(run, shape, s1, rng, reps=1)
            _time(run, shape, s2, rng, reps=1)
            t1 = _time(run, shape, s1, rng)
            t2 = _time(run, shape, s2, rng)
            per[kk] = (t2 - t1) / (s2 - s1)        # per kernel call
        per_op = (per[k] - per[2]) / (k - 2)
        vregs = max(1, int(np.prod(shape)) // 1024)
        print(f"shape {str(shape):12s} call(2op) {per[2]*1e6:7.2f} us  "
              f"call({k}op) {per[k]*1e6:8.2f} us  per-op "
              f"{per_op*1e9:6.2f} ns  (~{vregs} vregs)", flush=True)


if __name__ == "__main__":
    main()
