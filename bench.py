#!/usr/bin/env python3
"""Headline benchmark: lockstep env throughput (sample + step) on one chip.

Mirrors the reference's asv ``TimeEnvs.time_run`` workload (reference:
benchmarks/benchmarks.py:5-51): masked-random self-play at max_steps=100000.
Finished episodes auto-reset between scan chunks (bucketed sparse reset);
the per-step work is the full sample+step+mask pipeline either as

  * ``--backend kernel`` (default): one fused Pallas step kernel launch per
    step (ops/step_kernel.py) — bit-exact vs the XLA path
    (tests/test_step_kernel.py, tools/tpu_kernel_check.py), or
  * ``--backend xla``: the jitted vmapped engine step.

If the kernel backend fails to build on the current toolchain the bench
falls back to XLA and says so in the JSON line ("backend": "xla-fallback").

Prints ONE JSON line:
  {"metric": ..., "value": steps/s, "unit": "env-steps/s", "vs_baseline": r}
vs_baseline is against BASELINE.json's target of 10M env-steps/s/chip at
4096 lockstep envs (the reference repo publishes no absolute numbers).
``--sweep`` / ``--all-modes`` print extra per-config lines to stderr first.

Reset semantics: finished envs regenerate at chunk boundaries (the
reference auto-resets within step_single; a finished env here dead-steps
to its boundary first). ``--chunk 1 --chunks N`` gives exact same-step
auto-reset parity mode; the default chunk trades reset latency for
throughput and reports the episode count so the workload is auditable.
"""
import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

# --mesh N on a host-only backend needs the virtual device count fixed
# BEFORE jax initialises; on real multi-chip hardware the flag is a no-op
# (jax.devices() already exposes the chips).
if "--mesh" in sys.argv:
    _n = int(sys.argv[sys.argv.index("--mesh") + 1])
    if _n > 1 and os.environ.get("JAX_PLATFORMS", "") == "cpu":
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={_n}")

import jax  # noqa: E402

# sitecustomize imports jax before this file can set the env var, so the
# persistent compilation cache must be enabled via config (see
# tests/conftest.py)
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

BASELINE_STEPS_PER_SEC = 10_000_000.0


def _prewarm_resets(states, n_envs):
    """Compile the bucketed-reset programs the kernel path's final sweep
    can use (the reset-queue capacity scales with the batch) so a
    multi-second compile never lands inside the timed region."""
    import jax.numpy as jnp
    from eldorado_tpu.vec import _RESET_BUCKETS, _reset_bucket
    q = min(1024, max(128, n_envs // 32))
    warm_buckets = {min(128, n_envs)}
    for b in _RESET_BUCKETS:
        if b >= q:
            warm_buckets.add(min(b, n_envs))
            break
    for b in sorted(warm_buckets):
        warm = _reset_bucket(states, jnp.zeros(b, jnp.int32), b)
        jax.block_until_ready(warm.rng)


def run_config(envs, chunk, chunks, players, pieces, difficulty, backend,
               block, reset_mode="sync"):
    """Returns (steps_per_sec, actual_backend, episodes)."""
    from eldorado_tpu.vec import rollout_chunked, sampler_init, vec_reset

    states = vec_reset(12345, envs, players, pieces, difficulty, 100000)
    jax.block_until_ready(states.map_ids)
    rngs = sampler_init(42, envs)

    if backend == "kernel":
        try:
            s, r, _ = rollout_chunked(states, rngs, chunk, chunk,
                                      backend="kernel", block=block,
                                      reset_mode=reset_mode)
            jax.block_until_ready(s.rng)
        except Exception as e:  # Mosaic/toolchain failure: fall back
            print(f"kernel backend failed ({type(e).__name__}: {e}); "
                  "falling back to XLA", file=sys.stderr)
            backend = "xla-fallback"
    if backend.startswith("xla"):
        s, r, _ = rollout_chunked(states, rngs, chunk, chunk, backend="xla")
        jax.block_until_ready(s.rng)
    _prewarm_resets(states, envs)

    kb = "kernel" if backend == "kernel" else "xla"
    t0 = time.time()
    states, rngs, episodes = rollout_chunked(
        states, rngs, chunk * chunks, chunk, backend=kb, block=block,
        reset_mode=reset_mode)
    jax.block_until_ready(states.rng)
    dt = time.time() - t0
    return envs * chunk * chunks / dt, backend, episodes


def run_exact(envs, chunk, chunks, players, pieces, difficulty, block):
    """Exact same-step auto-reset semantics (vec_cog_env::step_single):
    finished envs are frozen (no sampler draws) until their reset lands,
    so per-env trajectories are bit-exact vs the reference's continuous
    streams and dead steps are EXCLUDED from the metric
    (tests/test_exact_reset.py). Returns (live_steps_per_sec, episodes,
    dead_fraction)."""
    from eldorado_tpu.vec import rollout_chunked, sampler_init, vec_reset

    states = vec_reset(12345, envs, players, pieces, difficulty, 100000)
    jax.block_until_ready(states.map_ids)
    rngs = sampler_init(42, envs)
    s, r, _, _ = rollout_chunked(states, rngs, chunk, chunk,
                                 backend="kernel", block=block, exact=True)
    jax.block_until_ready(s.rng)
    _prewarm_resets(states, envs)

    total = envs * chunk * chunks
    t0 = time.time()
    states, rngs, episodes, dead = rollout_chunked(
        states, rngs, chunk * chunks, chunk, backend="kernel", block=block,
        exact=True)
    jax.block_until_ready(states.rng)
    dt = time.time() - t0
    return (total - dead) / dt, episodes, dead / total


def run_reset_free(envs, players, pieces, difficulty, block):
    """Steady-state step rate with NO reset machinery in the loop: the
    blocked kernel scan alone (progs.run), timed by step-count
    differencing with fresh sampler streams and host-materialisation
    barriers (the axon tunnel memoises identical dispatches and
    block_until_ready does not sync through it — docs/performance.md
    round-4 measurement correction). This is the denominator of the
    with-resets/reset-free ratio the docs quote."""
    import jax.numpy as jnp
    import numpy as np
    from eldorado_tpu.vec import _kernel_programs, sampler_init, vec_reset

    states = vec_reset(123, envs, players, pieces, difficulty, 100000)
    progs = _kernel_programs(states, "storage", min(block, envs), False)

    def timed(steps, seed):
        rngs = sampler_init(seed, envs)
        bctx, bdyn, brngs = progs.block_in(states, rngs)
        np.asarray(jnp.sum(brngs))          # land inputs
        t0 = time.perf_counter()
        _, _, _, dead, _ = progs.run(bctx, bdyn, brngs, steps, False)
        np.asarray(dead)                    # the only real sync
        return time.perf_counter() - t0

    s1, s2 = 200, 800
    timed(s1, 1)
    timed(s2, 2)                            # warm both program lengths
    t1 = min(timed(s1, s) for s in (11, 12, 13))
    t2 = min(timed(s2, s) for s in (14, 15, 16))
    return envs * (s2 - s1) / (t2 - t1)


def run_mesh(n_devices, envs, chunk, chunks, players, pieces, difficulty,
             block):
    """sharded_kernel_rollout over an n_devices mesh (real chips when
    available, else the virtual host mesh): per-shard blocked kernel
    scans + queued on-device auto-resets, one psum'd reset gate per
    chunk. Returns (steps_per_sec, episodes). The psum-gate overhead is
    isolated by comparing the 1-device mesh against the unsharded kernel
    path on the same workload (--mesh 1)."""
    from eldorado_tpu.parallel.mesh import make_mesh
    from eldorado_tpu.parallel.runner import sharded_kernel_rollout
    from eldorado_tpu.vec import sampler_init, vec_reset

    interpret = jax.devices()[0].platform != "tpu"
    mesh = make_mesh(n_devices)
    states = vec_reset(12345, envs, players, pieces, difficulty, 100000)
    jax.block_until_ready(states.map_ids)
    rngs = sampler_init(42, envs)
    block = min(block, envs // n_devices)
    s, r, _ = sharded_kernel_rollout(mesh, states, rngs, chunk, chunk,
                                     block=block, interpret=interpret)
    jax.block_until_ready(s.rng)
    _prewarm_resets(states, envs)
    t0 = time.time()
    s, r, episodes = sharded_kernel_rollout(
        mesh, states, rngs, chunk * chunks, chunk, block=block,
        interpret=interpret)
    jax.block_until_ready(s.rng)
    dt = time.time() - t0
    return envs * chunk * chunks / dt, episodes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=4096)
    ap.add_argument("--mesh", type=int, default=0,
                    help="N>0: run the kernel-sharded rollout over an "
                         "N-device mesh (virtual host mesh off-TPU) and "
                         "report per-device throughput; --mesh 1 vs the "
                         "default path isolates the shard_map+psum-gate "
                         "overhead on identical work")
    ap.add_argument("--chunk", type=int, default=1500)
    # 14 chunks (86k env-steps/env... 21k steps) amortise the ~64 ms of
    # per-call fixed work (block_in/unblock/final sweep) that a 7-chunk
    # run folds into the rate (measured: 25.5M @7 vs 26.5M @28 chunks on
    # identical steady state); production rollouts run far longer still
    ap.add_argument("--chunks", type=int, default=14)
    ap.add_argument("--reset-mode", choices=["sync", "async"],
                    default="sync",
                    help="sync: on-device queued resets at each boundary; "
                         "async: host-CPU procgen overlapped with the next "
                         "chunk (see vec.rollout_chunked)")
    ap.add_argument("--players", type=int, default=4)
    ap.add_argument("--pieces", type=int, default=3)
    ap.add_argument("--difficulty", type=int, default=0)
    ap.add_argument("--backend", choices=["kernel", "xla"], default="kernel")
    ap.add_argument("--block", type=int, default=1024)
    ap.add_argument("--sweep", action="store_true",
                    help="also time an env-count sweep (stderr)")
    ap.add_argument("--all-modes", action="store_true",
                    help="also time the other backend (stderr)")
    ap.add_argument("--no-exact", action="store_true",
                    help="skip the exact same-step auto-reset measurement")
    ap.add_argument("--no-stream", action="store_true",
                    help="skip the per-step learner-feed measurements")
    args = ap.parse_args()

    if args.sweep:
        for n in (256, 1024, 4096, 16384):
            sps, be, eps = run_config(n, args.chunk, args.chunks,
                                      args.players, args.pieces,
                                      args.difficulty, args.backend,
                                      min(args.block, n), args.reset_mode)
            print(f"sweep {be}@{n}: {sps:,.0f} steps/s "
                  f"({eps} episodes)", file=sys.stderr)
    if args.all_modes:
        other = "xla" if args.backend == "kernel" else "kernel"
        sps, be, eps = run_config(args.envs, args.chunk, args.chunks,
                                  args.players, args.pieces,
                                  args.difficulty, other,
                                  min(args.block, args.envs),
                                  args.reset_mode)
        print(f"mode {be}@{args.envs}: {sps:,.0f} steps/s "
              f"({eps} episodes)", file=sys.stderr)

    if args.mesh > 0:
        sps, episodes = run_mesh(
            args.mesh, args.envs, args.chunk, args.chunks, args.players,
            args.pieces, args.difficulty, min(args.block, args.envs))
        print(json.dumps({
            "metric": f"env_steps_per_sec@{args.envs}envs_mesh{args.mesh}",
            "value": round(sps, 1),
            "unit": "env-steps/s",
            "vs_baseline": round(sps / BASELINE_STEPS_PER_SEC, 4),
            "backend": "kernel-sharded",
            "mesh": args.mesh,
            "per_device_steps_per_sec": round(sps / args.mesh, 1),
            "chunk": args.chunk,
            "episodes_reset_mid_run": episodes,
        }))
        return 0

    sps, backend, episodes = run_config(
        args.envs, args.chunk, args.chunks, args.players, args.pieces,
        args.difficulty, args.backend, min(args.block, args.envs),
        args.reset_mode)
    line = {
        "metric": f"env_steps_per_sec@{args.envs}envs",
        "value": round(sps, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(sps / BASELINE_STEPS_PER_SEC, 4),
        "backend": backend,
        "reset_mode": args.reset_mode,
        "chunk": args.chunk,
        "episodes_reset_mid_run": episodes,
    }
    if backend == "kernel" and not args.no_exact:
        # the reference-semantics workload: same-step auto-reset per env
        # (frozen finishers, dead steps excluded from the count)
        try:
            esps, eeps, edead = run_exact(
                args.envs, args.chunk, args.chunks, args.players,
                args.pieces, args.difficulty,
                min(args.block, args.envs))
            line["exact_env_steps_per_sec"] = round(esps, 1)
            line["exact_vs_baseline"] = round(
                esps / BASELINE_STEPS_PER_SEC, 4)
            line["exact_episodes"] = eeps
            line["exact_dead_fraction"] = round(edead, 5)
        except Exception as e:
            print(f"exact mode failed ({type(e).__name__}: {e})",
                  file=sys.stderr)
    if backend == "kernel" and args.envs == 4096:
        # large-batch scaling point for the driver artifact: 16384 envs
        # on the same workload (VERDICT r4 asked the 16k gap be captured)
        try:
            sps16, _, eps16 = run_config(
                16384, args.chunk, 5, args.players, args.pieces,
                args.difficulty, "kernel", min(args.block, 16384),
                args.reset_mode)
            line["sixteenk_env_steps_per_sec"] = round(sps16, 1)
            line["sixteenk_per_env_vs_4096"] = round(sps16 / sps, 4)
            line["sixteenk_episodes"] = eps16
        except Exception as e:
            print(f"16384-env probe failed ({type(e).__name__}: {e})",
                  file=sys.stderr)
    if backend == "kernel":
        # reset-free denominator (the docs' headline ratio is
        # with-resets / reset-free; capture both in the driver artifact)
        try:
            rf = run_reset_free(args.envs, args.players, args.pieces,
                                args.difficulty, min(args.block, args.envs))
            line["reset_free_env_steps_per_sec"] = round(rf, 1)
            line["with_resets_vs_reset_free"] = round(sps / rf, 4)
        except Exception as e:
            print(f"reset-free probe failed ({type(e).__name__}: {e})",
                  file=sys.stderr)
    if backend == "kernel" and not args.no_stream:
        # the per-step learner feed (eldorado_tpu.stream): packed 5-word
        # records per env per step off the kernel scan, consumed (a) ON
        # DEVICE (co-located JAX learner pattern) and (b) through the
        # host TrajectoryRing (delivered rate is device->host-link-bound;
        # PCIe-class hosts sustain the device rate, this environment's
        # network tunnel ~9-16 MB/s does not — docs/performance.md)
        try:
            import numpy as _np
            from eldorado_tpu import stream as S
            from eldorado_tpu.vec import sampler_init, vec_reset
            st = vec_reset(12345, args.envs, args.players, args.pieces,
                           args.difficulty, 100000)
            rg = sampler_init(42, args.envs)
            S.stream_rollout(st, rg, args.chunk, args.chunk,
                             block=min(args.block, args.envs),
                             deliver="device")
            t0 = time.time()
            _, _, _, carry = S.stream_rollout(
                st, rg, args.chunk * 3, args.chunk,
                block=min(args.block, args.envs), deliver="device")
            dev_sps = int(_np.asarray(carry[0])) / (time.time() - t0)
            line["stream_device_env_steps_per_sec"] = round(dev_sps, 1)
            # the FULL observation feed (40-word records: actor piles,
            # shop, storage rows — stream.RECORD_WORDS_FULL), consumed
            # on device; chunk shrinks to keep the (chunk, nb, 40,
            # block) trajectory buffer ~200 MB
            fchunk = min(args.chunk, 300)
            S.stream_rollout(st, rg, fchunk, fchunk,
                             block=min(args.block, args.envs),
                             deliver="device", record="full")
            t0 = time.time()
            _, _, _, fcarry = S.stream_rollout(
                st, rg, fchunk * 5, fchunk,
                block=min(args.block, args.envs),
                deliver="device", record="full")
            fdev = int(_np.asarray(fcarry[0])) / (time.time() - t0)
            line["stream_full_device_env_steps_per_sec"] = round(fdev, 1)
            t0 = time.time()
            _, _, _, cons = S.stream_rollout(
                st, rg, args.chunk, args.chunk,
                block=min(args.block, args.envs), deliver="ring")
            ring_sps = cons.records / (time.time() - t0)
            line["stream_ring_env_steps_per_sec"] = round(ring_sps, 1)
            line["stream_ring_checksum_ok"] = bool(cons.records
                                                   == args.envs * args.chunk)
            # delta-compressed delivery: the device ships 32-bit headers
            # + changed-word payloads; the host decompresses (bit-exact,
            # tests/test_stream.py) and feeds the same ring
            S.stream_rollout(st, rg, args.chunk, args.chunk,
                             block=min(args.block, args.envs),
                             deliver="ring", compress=True)
            t0 = time.time()
            _, _, _, ccons = S.stream_rollout(
                st, rg, args.chunk, args.chunk,
                block=min(args.block, args.envs), deliver="ring",
                compress=True)
            csps = ccons.records / (time.time() - t0)
            line["stream_ring_compressed_env_steps_per_sec"] = round(csps, 1)
            line["stream_ring_bytes_per_record"] = round(
                ccons.tunnel_bytes / max(1, ccons.records), 2)
        except Exception as e:
            print(f"stream mode failed ({type(e).__name__}: {e})",
                  file=sys.stderr)
    print(json.dumps(line))
    return 0


if __name__ == "__main__":
    sys.exit(main())
