#!/usr/bin/env python3
"""Split one queued reset EVENT (run_auto's fire branch) into its parts.

Methodology (round-5 validated — docs/performance.md): the axon tunnel
memoises repeated identical dispatches, per-call host barriers pay a
~25 ms RTT, and `block_until_ready` does not synchronise through the
tunnel. So every timed region uses DISTINCT device-resident inputs,
dispatches k calls back-to-back with ONE host-materialisation barrier at
the end, and reports the k2-vs-k1 DIFFERENCED slope (fixed costs and the
RTT cancel).

    python tools/tpu_reset_event_split.py [--envs 4096] [--block 1024]
"""
import argparse
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
import jax.numpy as jnp  # noqa: E402

from eldorado_tpu import vec  # noqa: E402
from eldorado_tpu.core import mapgen as MG  # noqa: E402
from eldorado_tpu.ops import rng as R  # noqa: E402


def _diff(run_k, k1=2, k2=8, reps=2):
    t1 = min(run_k(k1, 2 + i * k1) for i in range(reps))
    t2 = min(run_k(k2, 6 + i * k2) for i in range(reps))
    return (t2 - t1) / (k2 - k1)


def main(envs=4096, block=1024, chunk=1500):
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=envs)
    ap.add_argument("--block", type=int, default=block)
    args = ap.parse_args()
    envs, block = args.envs, args.block
    print("devices:", jax.devices(), flush=True)

    states = vec.vec_reset(12345, envs, 4, 3, 0, 100000)
    rngs = vec.sampler_init(42, envs)
    progs = vec._kernel_programs(states, "storage", block, False)
    bctx, bdyn, brngs = progs.block_in(states, rngs)
    qstate = progs.qstate_init()

    # collect distinct reset queues + result buffers from real boundaries
    queues, bufs = [], []
    while len(queues) < 24:
        bdyn, brngs, qstate, any_new, resetq = progs.run_q(
            bctx, bdyn, brngs, qstate, chunk)
        if bool(any_new):
            buf = progs.reset_q_dev(resetq)
            queues.append(resetq)
            bufs.append(buf)
            bdyn, bctx, states, qstate = progs.apply_q(
                bdyn, bctx, states, qstate, buf)
    np.asarray(qstate[1])              # drain all pending work
    print(f"collected {len(queues)} distinct reset queues")

    def rq_k(k, off):
        t0 = time.perf_counter()
        outs = [progs.reset_q_dev(q) for q in queues[off:off + k]]
        np.asarray(outs[-1][0])
        return time.perf_counter() - t0

    print(f"reset_q_dev (mapgen+body+pack): "
          f"{_diff(rq_k) * 1e3:6.1f} ms/event")

    def aq_k(k, off):
        nonlocal bdyn, bctx, states, qstate
        t0 = time.perf_counter()
        for b in bufs[off:off + k]:
            bdyn, bctx, states, qstate = progs.apply_q(
                bdyn, bctx, states, qstate, b)
        np.asarray(qstate[1][0])
        return time.perf_counter() - t0

    print(f"apply_q (scatters+table rows):  "
          f"{_diff(aq_k) * 1e3:6.1f} ms/event")

    # generate_map alone at queue width (vmapped, same event shape)
    Q = progs.q_cap
    sfn = jax.jit(jax.vmap(R.seed))
    gen = jax.jit(jax.vmap(lambda r: MG.generate_map(r, 3, 0).ids[0]))
    pool = []
    for i in range(24):
        base = (np.arange(Q, dtype=np.uint64) * 2654435761 + 77 + i) \
            % (1 << 32)
        pool.append(sfn(jnp.asarray(base.astype(np.uint32))))
    for p in pool:
        np.asarray(p[0])
    gen(pool[0])
    np.asarray(gen(pool[1])[0])

    def gm_k(k, off):
        t0 = time.perf_counter()
        outs = [gen(pool[off + i]) for i in range(k)]
        np.asarray(outs[-1][0])
        return time.perf_counter() - t0

    print(f"generate_map alone (Q={Q}):     "
          f"{_diff(gm_k) * 1e3:6.1f} ms/event")


if __name__ == "__main__":
    main()
