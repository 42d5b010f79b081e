#!/usr/bin/env python3
"""Measure the on-device reset event cost: vmapped reset_env (procgen)
at several queue widths, on the real chip. This is the denominator of
the exact same-step auto-reset mode (VERDICT r2 items 3/5)."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np
from eldorado_tpu.core import engine as E

def time_reset(q, n_pieces=3, iters=10):
    seeds = jnp.arange(q, dtype=jnp.uint32) + 1000
    make = jax.vmap(lambda s: E.make_state(s, 4, n_pieces, 0, 100000))
    vreset = jax.jit(jax.vmap(E.reset_env))
    states = make(seeds)
    out = vreset(states); jax.block_until_ready(out.rng)   # warm
    t0 = time.time()
    for i in range(iters):
        out = vreset(make(seeds + i))
        jax.block_until_ready(out.rng)
    dt = (time.time() - t0) / iters
    print(f"Q={q:4d} n_pieces={n_pieces}: {dt*1e3:8.2f} ms/event "
          f"({dt/q*1e6:7.1f} us/env)")
    return dt

for q in (1, 8, 32, 128):
    time_reset(q)
