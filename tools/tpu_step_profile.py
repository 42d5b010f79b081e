#!/usr/bin/env python3
"""Decompose the per-step cost of the fused kernel pipeline on the TPU.

Times, each jitted separately over a lax.scan of --iters iterations:
  1. ball pregather alone        (vmap(E._ball_cells))
  2. layout transposes alone     (t_in of all dyn leaves + t_out back)
  3. fused kernel w/ everything  (kernel_rollout step)
  4. XLA step                    (rollout step, for reference)

Usage: python tools/tpu_step_profile.py [--envs 4096] [--block 512]

NOTE (round 4): jax.block_until_ready does NOT synchronise
through this environment's device tunnel and identical dispatches
are memoised — figures from this probe's original methodology are
unreliable; prefer tools/tpu_true_step_cost.py (host-
materialisation barriers + step-count differencing).
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

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=4096)
    ap.add_argument("--block", type=int, default=512)
    ap.add_argument("--steps", type=int, default=100)
    args = ap.parse_args()

    print("devices:", jax.devices(), flush=True)
    from eldorado_tpu.core import engine as E
    from eldorado_tpu.vec import (kernel_rollout, rollout, sampler_init,
                                  vec_reset)

    n = args.envs
    states = vec_reset(123, n, 4, 3, 0, 100000)
    jax.block_until_ready(states.map_ids)
    rngs = sampler_init(7, n)
    T = args.steps

    # 1. pregather alone
    @jax.jit
    def pregather_loop(states):
        def body(c, _):
            ball = jax.vmap(E._ball_cells)(states)
            return c + ball[0].sum(), None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), None, length=T)
        return acc

    t = timeit(pregather_loop, states)
    print(f"pregather      : {t/T*1e6:9.1f} us/step", flush=True)

    # 2. transposes alone (in and out)
    from eldorado_tpu.ops import step_kernel as K
    nb = n // args.block

    @jax.jit
    def transpose_loop(states):
        _, dyn = E.split_state(states)

        def t_in(x):
            if x.ndim == 1:
                return x.reshape(nb, 1, args.block)
            x = x.reshape((nb, args.block) + x.shape[1:])
            return jnp.moveaxis(x, 1, -1)

        def t_out(o, fshape):
            if len(fshape) == 0:
                return o.reshape(n)
            o = jnp.moveaxis(o, -1, 1)
            return o.reshape((n,) + tuple(fshape))

        def body(dyn, _):
            ins = [t_in(x.astype(jnp.int32) if x.dtype == jnp.bool_ else x)
                   for x in dyn]
            outs = [t_out(i, tuple(x.shape[1:]))
                    for i, x in zip(ins, dyn)]
            outs = [o.astype(x.dtype) for o, x in zip(outs, dyn)]
            return tuple(outs), None

        dyn, _ = jax.lax.scan(body, tuple(dyn), None, length=T)
        return dyn

    t = timeit(transpose_loop, states)
    print(f"transpose rt   : {t/T*1e6:9.1f} us/step", flush=True)

    # 3. full kernel rollout
    def kr(states, rngs):
        return kernel_rollout(states, rngs, T, block=args.block)

    t = timeit(kr, states, rngs)
    print(f"kernel step    : {t/T*1e6:9.1f} us/step "
          f"({n/(t/T)/1e6:.2f}M env-steps/s)", flush=True)

    # 4. XLA rollout
    def xr(states, rngs):
        return rollout(states, rngs, T, auto_reset="none")

    t = timeit(xr, states, rngs)
    print(f"xla step       : {t/T*1e6:9.1f} us/step "
          f"({n/(t/T)/1e6:.2f}M env-steps/s)", flush=True)


if __name__ == "__main__":
    main()
