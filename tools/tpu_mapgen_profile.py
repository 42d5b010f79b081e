#!/usr/bin/env python3
"""Attribute the reset-event cost: time ONE mapgen trip body in isolation.

The chunk-boundary reset event (~60 ms for a 128-env queue) is procgen's
trip loop; this probe times `mapgen._trip` vmapped at queue width as a
scan of K trips (differenced), plus ablated variants (overlap fori
stubbed, RNG draws stubbed) to locate the mass. Ablations change
semantics — timing only.

    python tools/tpu_mapgen_profile.py [--q 128] [--k 40]
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
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--q", type=int, default=128)
    ap.add_argument("--k1", type=int, default=10)
    ap.add_argument("--k2", type=int, default=40)
    args = ap.parse_args()
    print("devices:", jax.devices(), flush=True)
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from eldorado_tpu.core import mapgen as MG
    from eldorado_tpu.ops import rng as R
    Q = args.q

    def init_state(rng):
        import eldorado_tpu.core.mapgen as M
        return M.MapGenState(
            entries=jnp.full((M.MAX_PLACED,), -1, jnp.int32),
            entry_rot=jnp.zeros((M.MAX_PLACED,), jnp.int32),
            entry_center=jnp.zeros((M.MAX_PLACED, 2), jnp.int32),
            n_entries=jnp.int32(0),
            min_xy=jnp.zeros((2,), jnp.int32),
            max_xy=jnp.zeros((2,), jnp.int32),
            piece_rot=jnp.zeros((20,), jnp.int32),
            piece_center=jnp.zeros((20, 2), jnp.int32),
            frame_rng=jnp.full((M.MAX_DEPTH,),
                               jnp.asarray(rng, jnp.int32)),
            frame_i=jnp.zeros((M.MAX_DEPTH,), jnp.int32),
            frame_valid=jnp.zeros((M.MAX_DEPTH,), jnp.int32),
            frame_resume=jnp.zeros((M.MAX_DEPTH,), jnp.int32),
            sp=jnp.int32(0), pc=jnp.int32(0),
            finished=jnp.bool_(False), aborted=jnp.bool_(False),
            overflow=jnp.bool_(False))

    def build(k, trip):
        @jax.jit
        def run(rngs):
            s0 = jax.vmap(init_state)(rngs)

            def body(s, _):
                # never finish: clear the finished/pop flags so every
                # iteration does full trip work (timing only)
                s = jax.vmap(lambda x: trip(x, jnp.int32(3),
                                            jnp.int32(0)))(s)
                s = s._replace(finished=jnp.zeros_like(s.finished),
                               aborted=jnp.zeros_like(s.aborted))
                return s, None
            s, _ = jax.lax.scan(body, s0, None, length=k)
            return jnp.sum(s.n_entries) + jnp.sum(s.frame_rng)
        return run

    def timed(run):
        seeds = np.random.default_rng(0)

        def once():
            r = jnp.asarray(seeds.integers(1, 1 << 30, Q), jnp.int32)
            np.asarray(jnp.sum(r))
            t0 = time.perf_counter()
            np.asarray(run(r))
            return time.perf_counter() - t0
        once()
        return min(once() for _ in range(3))

    def variant(name, trip):
        r1 = build(args.k1, trip)
        r2 = build(args.k2, trip)
        t1, t2 = timed(r1), timed(r2)
        per = (t2 - t1) / (args.k2 - args.k1)
        print(f"{name:18s} per-trip {per*1e3:7.2f} ms "
              f"(t{args.k1}={t1*1e3:6.1f} t{args.k2}={t2*1e3:6.1f})",
              flush=True)
        return per

    full = variant("full", MG._trip)

    # ablation: overlap fori returns no-overlap
    real_fori = jax.lax.fori_loop

    def trip_no_overlap(s, n_pieces, difficulty):
        def fake_fori(lo, hi, f, init):
            return init
        jax.lax.fori_loop = fake_fori
        try:
            return MG._trip(s, n_pieces, difficulty)
        finally:
            jax.lax.fori_loop = real_fori
    variant("no-overlap-fori", trip_no_overlap)

    # ablation: exact uniform_int draws -> single LCG step, no while
    real_ui = R.uniform_int

    def trip_fast_rng(s, n_pieces, difficulty):
        def fake_ui(x, n):
            x = R.next_u31(x)
            return jax.lax.rem(x, jnp.maximum(jnp.asarray(n, jnp.int32),
                                              1)), x
        R.uniform_int = fake_ui
        try:
            return MG._trip(s, n_pieces, difficulty)
        finally:
            R.uniform_int = real_ui
    variant("fast-rng", trip_fast_rng)

    # ablation: both
    def trip_min(s, n_pieces, difficulty):
        def fake_fori(lo, hi, f, init):
            return init

        def fake_ui(x, n):
            x = R.next_u31(x)
            return jax.lax.rem(x, jnp.maximum(jnp.asarray(n, jnp.int32),
                                              1)), x
        jax.lax.fori_loop = fake_fori
        R.uniform_int = fake_ui
        try:
            return MG._trip(s, n_pieces, difficulty)
        finally:
            jax.lax.fori_loop = real_fori
            R.uniform_int = real_ui
    variant("both-ablated", trip_min)


if __name__ == "__main__":
    main()
