#!/usr/bin/env python3
"""Measure the on-device reset event cost at several queue widths.

Everything (make_state + reset_env incl. procgen) runs inside ONE jitted
program per width — eager per-op dispatch over the network-tunnelled
device costs ~ms per op and would swamp the measurement otherwise — and
every timed call gets FRESH seeds with a per-call block: the axon tunnel
memoises repeated identical (executable, input) calls, which makes naive
timing loops read ~100x too fast.

NOTE (round 4): jax.block_until_ready does NOT synchronise
through this environment's device tunnel and identical dispatches
are memoised — figures from this probe's original methodology are
unreliable; prefer tools/tpu_true_step_cost.py (host-
materialisation barriers + step-count differencing).
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from eldorado_tpu.core import engine as E  # noqa: E402
from eldorado_tpu.core import mapgen as MG  # noqa: E402
from eldorado_tpu.ops import rng as R  # noqa: E402


def bench(f, q, iters=8):
    o = f(jnp.arange(q, dtype=jnp.uint32) + 1000)
    jax.block_until_ready(o)
    ts = []
    for i in range(iters):
        seeds = jnp.arange(q, dtype=jnp.uint32) + 2000 + 131 * i
        t0 = time.time()
        o = f(seeds)
        jax.block_until_ready(o)
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2]


def main(n_pieces=3):
    for q in (1, 8, 32, 128):
        @jax.jit
        def full_reset(seeds):
            make = jax.vmap(
                lambda s: E.make_state(s, 4, n_pieces, 0, 100000))
            return jax.vmap(E.reset_env)(make(seeds))

        @jax.jit
        def gen_only(seeds):
            rngs = jax.vmap(R.seed)(seeds)
            return jax.vmap(lambda r: MG.generate_map(r, n_pieces, 0))(rngs)

        t_gen = bench(gen_only, q)
        t_full = bench(full_reset, q)
        print(f"Q={q:4d} n_pieces={n_pieces}: generate_map "
              f"{t_gen*1e3:7.2f} ms   full reset {t_full*1e3:7.2f} ms "
              f"({t_full/q*1e6:7.1f} us/env)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
