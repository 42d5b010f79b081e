#!/usr/bin/env python3
"""On-TPU validation + timing for the fused Pallas step kernel.

Runs on the real chip (axon). Two parts:
  1. bit-exactness: N steps of kernel_rollout vs the XLA rollout path,
     comparing every EnvState leaf + actions/rewards each step.
  2. throughput: timed kernel_rollout at --envs lockstep envs.

Usage: python tools/tpu_kernel_check.py [--envs 4096] [--steps 20]
       [--timing-steps 1000] [--skip-parity]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 ".jax_cache_tpu"))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=4096)
    ap.add_argument("--parity-envs", type=int, default=256)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--timing-steps", type=int, default=1000)
    ap.add_argument("--block", type=int, default=512)
    ap.add_argument("--skip-parity", action="store_true")
    ap.add_argument("--skip-timing", action="store_true")
    args = ap.parse_args()

    print("devices:", jax.devices(), flush=True)
    from eldorado_tpu.vec import (kernel_rollout, rollout, sampler_init,
                                  vec_reset)
    from eldorado_tpu.core import engine as E

    if not args.skip_parity:
        n = args.parity_envs
        states = vec_reset(123, n, 4, 3, 1, 100000)
        rngs = sampler_init(7, n)
        t0 = time.time()
        sk, rk, (ak, dk, rwk, agk) = kernel_rollout(
            states, rngs, args.steps, "storage", args.block)
        jax.block_until_ready(sk.rng)
        print(f"kernel compile+run ({args.steps} steps): "
              f"{time.time()-t0:.1f}s", flush=True)
        sx, rx, (ax, dx, rwx, agx, *_rest) = rollout(
            states, rngs, args.steps, "storage", "none")
        jax.block_until_ready(sx.rng)
        ok = True
        for name in E.EnvState._fields:
            a, b = np.asarray(getattr(sk, name)), np.asarray(
                getattr(sx, name))
            if not np.array_equal(a, b):
                ok = False
                print(f"MISMATCH {name}: {np.sum(a != b)} cells", flush=True)
        for lbl, a, b in [("actions", ak, ax), ("done", dk, dx),
                          ("rewards", rwk, rwx), ("agent", agk, agx),
                          ("srng", rk, rx)]:
            if not np.array_equal(np.asarray(a), np.asarray(b)):
                ok = False
                print(f"MISMATCH traj {lbl}", flush=True)
        print("PARITY:", "OK" if ok else "FAILED", flush=True)
        if not ok:
            return 1

    if not args.skip_timing:
        n = args.envs
        states = vec_reset(12345, n, 4, 3, 0, 100000)
        rngs = sampler_init(42, n)
        # compile + warm
        t0 = time.time()
        # warm the SAME program that gets timed: n_steps is a static
        # argnum, so a different step count would compile separately and
        # the timed call would include its own ~30s compile
        s, r, _ = kernel_rollout(states, rngs, args.timing_steps,
                                 "storage", args.block)
        jax.block_until_ready(s.rng)
        print(f"timing-path compile+warm: {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        s, r, _ = kernel_rollout(states, rngs, args.timing_steps,
                                 "storage", args.block)
        jax.block_until_ready(s.rng)
        dt = time.time() - t0
        sps = n * args.timing_steps / dt
        print(f"kernel throughput: {sps:,.0f} env-steps/s "
              f"({n} envs x {args.timing_steps} steps in {dt:.2f}s)",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
