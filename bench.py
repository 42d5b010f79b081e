#!/usr/bin/env python3
"""Headline benchmark: lockstep env throughput (sample + step) on one chip.

Mirrors the reference's asv ``TimeEnvs.time_run`` workload (reference:
benchmarks/benchmarks.py:5-51): masked-random self-play at max_steps=100000
(episodes never truncate within the run, matching the reference bench where
the C++ envs never reset during timing). The rollout is a jitted lax.scan —
sample, step, batch-gated auto-reset — dispatched in chunks.

Prints ONE JSON line:
  {"metric": ..., "value": steps/s, "unit": "env-steps/s", "vs_baseline": r}
vs_baseline is against BASELINE.json's target of 10M env-steps/s/chip at
4096 lockstep envs (the reference repo publishes no absolute numbers).
"""
import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

import jax  # noqa: E402

BASELINE_STEPS_PER_SEC = 10_000_000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=4096)
    ap.add_argument("--chunk", type=int, default=100)
    ap.add_argument("--chunks", type=int, default=10)
    ap.add_argument("--players", type=int, default=4)
    ap.add_argument("--pieces", type=int, default=3)
    ap.add_argument("--difficulty", type=int, default=0)
    args = ap.parse_args()

    from eldorado_tpu.vec import rollout, rollout_chunked, sampler_init, vec_reset

    states = vec_reset(12345, args.envs, args.players, args.pieces,
                       args.difficulty, 100000)
    jax.block_until_ready(states.map_obs)
    rngs = sampler_init(42, args.envs)

    # warmup / compile: the rollout scan and the bucketed-reset programs
    # (they fire mid-run when episodes finish)
    from eldorado_tpu.vec import _RESET_BUCKETS, _reset_bucket
    import jax.numpy as jnp
    states, rngs, _ = rollout(states, rngs, args.chunk, "storage", "none")
    jax.block_until_ready(states.rng)
    for b in _RESET_BUCKETS[:3]:
        if b <= args.envs:
            warm = _reset_bucket(states, jnp.zeros(b, jnp.int32), b)
    jax.block_until_ready(warm.rng)

    t0 = time.time()
    states, rngs, _ = rollout_chunked(states, rngs,
                                      args.chunk * args.chunks, args.chunk)
    jax.block_until_ready(states.rng)
    dt = time.time() - t0

    total = args.envs * args.chunk * args.chunks
    sps = total / dt
    print(json.dumps({
        "metric": f"env_steps_per_sec@{args.envs}envs",
        "value": round(sps, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(sps / BASELINE_STEPS_PER_SEC, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
