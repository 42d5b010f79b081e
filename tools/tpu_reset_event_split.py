#!/usr/bin/env python3
"""Split one queued reset EVENT (run_auto's fire branch) into its parts.

Methodology per docs/performance.md round-4 correction: the axon tunnel
memoises repeated identical dispatches and block_until_ready does not
synchronise through it, so every timed call uses a DISTINCT input buffer
(collected from real chunk boundaries) and the barrier is host
materialisation of a scalar derived from the result.

Parts timed at the bench configuration (4096 envs, block 1024, Q=128):
  reset_q     mapgen + rasterise + ball pregather + fused reset body
  apply_q     scatter columns + rebuild Q ball-table rows + env-major rows
  chunk0      a 100-step chunk with no finishers (baseline)
  chunk1      the same chunk with the cond-gated fire branch taken
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
import jax  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from eldorado_tpu import vec  # noqa: E402


def main(envs=4096, block=1024, chunk=1500, rounds=6):
    print("devices:", jax.devices())
    states = vec.vec_reset(12345, envs, 4, 3, 0, 100000)
    rngs = vec.sampler_init(42, envs)
    progs = vec._kernel_programs(states, "storage", block, False)
    bctx, bdyn, brngs = progs.block_in(states, rngs)
    qstate = progs.qstate_init()

    # collect distinct reset queues from real chunk boundaries
    queues = []
    while len(queues) < rounds:
        bdyn, brngs, qstate, any_new, resetq = progs.run_q(
            bctx, bdyn, brngs, qstate, chunk)
        if bool(any_new):
            queues.append(resetq)
            bdyn, bctx, states, qstate = progs.apply_q(
                bdyn, bctx, states, qstate, progs.reset_q_dev(resetq))
    counts = [int(np.asarray(q[0])) for q in queues]
    print(f"collected {len(queues)} queues, finisher counts: {counts}")

    # reset_q alone (distinct buffers, host-materialisation barrier)
    bufs = []
    t0 = time.time()
    for q in queues:
        buf = progs.reset_q_dev(q)
        _ = int(np.asarray(buf[0]))
        bufs.append(buf)
    t_rq = (time.time() - t0) / len(queues)
    print(f"reset_q_dev: {t_rq * 1e3:8.1f} ms/event")

    # apply_q alone (no donation reuse issues: fresh run each time)
    t0 = time.time()
    for buf in bufs:
        bdyn, bctx, states, qstate = progs.apply_q(
            bdyn, bctx, states, qstate, buf)
        _ = int(np.asarray(qstate[1][0]))
    t_aq = (time.time() - t0) / len(bufs)
    print(f"apply_q:     {t_aq * 1e3:8.1f} ms/event")

    # run_auto with no finishers vs with the fire branch taken: use a
    # fresh, just-reset batch (max_steps large -> no finishers for the
    # first ~3k steps) and step-count differencing at two chunk lengths
    states2 = vec.vec_reset(777, envs, 4, 3, 0, 100000)
    rngs2 = vec.sampler_init(43, envs)
    b2ctx, b2dyn, b2rngs = progs.block_in(states2, rngs2)
    q2 = progs.qstate_init()
    for steps in (200, 800):
        b2ctx, b2dyn, b2rngs, q2, states2 = progs.run_auto(
            b2ctx, b2dyn, b2rngs, q2, states2, steps)  # warm both lengths
    t = {}
    for steps in (200, 800):
        t0 = time.time()
        for _ in range(3):
            b2ctx, b2dyn, b2rngs, q2, states2 = progs.run_auto(
                b2ctx, b2dyn, b2rngs, q2, states2, steps)
        _ = int(np.asarray(q2[1][0]))
        t[steps] = (time.time() - t0) / 3
    per_step = (t[800] - t[200]) / 600
    print(f"reset-free step (run_auto differencing): {per_step*1e6:6.1f} us"
          f" -> {envs / per_step / 1e6:6.2f}M env-steps/s")
    print(f"implied event cost at chunk {chunk}: measured bench delta")


if __name__ == "__main__":
    main()
