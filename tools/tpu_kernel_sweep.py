#!/usr/bin/env python3
"""Block-size / batch sweep for the fused kernel on the real chip.
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

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 ".jax_cache_tpu"))

import jax


def time_cfg(envs, block, steps, backend="kernel"):
    from eldorado_tpu.vec import kernel_rollout, rollout, sampler_init, vec_reset
    states = vec_reset(12345, envs, 4, 3, 0, 100000)
    rngs = sampler_init(42, envs)
    jax.block_until_ready(states.map_ids)

    def go(n):
        if backend == "kernel":
            s, r, _ = kernel_rollout(states, rngs, n, "storage", block)
        else:
            s, r, _ = rollout(states, rngs, n, "storage", "none")
        jax.block_until_ready(s.rng)

    t0 = time.time(); go(steps); tc = time.time() - t0
    t0 = time.time(); go(steps); dt = time.time() - t0
    sps = envs * steps / dt
    print(f"{backend} envs={envs} block={block}: {sps:,.0f} steps/s "
          f"({dt/steps*1e3:.3f} ms/step; compile+first {tc:.1f}s)",
          flush=True)
    return sps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--cfg", action="append", default=None,
                    help="envs:block[:backend], repeatable")
    args = ap.parse_args()
    print("devices:", jax.devices(), flush=True)
    cfgs = args.cfg or ["256:256", "4096:256", "4096:1024", "4096:4096"]
    for c in cfgs:
        parts = c.split(":")
        envs, block = int(parts[0]), int(parts[1])
        backend = parts[2] if len(parts) > 2 else "kernel"
        try:
            time_cfg(envs, block, args.steps, backend)
        except Exception as e:
            print(f"cfg {c} FAILED: {type(e).__name__}: {e}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
