#!/usr/bin/env python3
"""True per-step cost of the blocked kernel scan, with a real barrier.

``jax.block_until_ready`` does NOT synchronise through the axon tunnel
(measured: a 35 ms scan "blocks" in 0.08 ms; only host materialisation
waits), so per-step figures from block_until_ready loops are unreliable.
This probe times the actual rollout scan by differencing two step counts,
with np.asarray(scalar) as the barrier, fresh sampler streams per call.

    python tools/tpu_true_step_cost.py [--envs 4096] [--block 512]
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

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ["JAX_COMPILATION_CACHE_DIR"])

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=4096)
    ap.add_argument("--block", type=int, default=512)
    ap.add_argument("--s1", type=int, default=200)
    ap.add_argument("--s2", type=int, default=800)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    print("devices:", jax.devices(), flush=True)

    import functools
    from eldorado_tpu.core import engine as E
    from eldorado_tpu.ops.step_kernel import make_fused_step
    from eldorado_tpu.vec import _kernel_programs, sampler_init, vec_reset

    n, block = args.envs, args.block
    states = vec_reset(123, n, 4, 3, 0, 100000)
    progs = _kernel_programs(states, "storage", block, False)
    GRID2 = E.GRIDSIZE * E.GRIDSIZE
    i_xy = E.DYN_FIELDS.index("player_xy")
    i_done = E.DYN_FIELDS.index("done")
    i_agent = E.DYN_FIELDS.index("agent")

    def build_variant(null_body, gather):
        fused = make_fused_step(states, "storage", block,
                                null_body=null_body)
        t_in = fused.t_in

        @functools.partial(jax.jit, static_argnums=(3,),
                           donate_argnums=(1, 2))
        def run(bctx, bdyn, brngs, n_steps):
            tab, bmin, bnp, bms, _ = bctx
            NROW = GRID2 // 32
            tab2 = tab.reshape(n * NROW, 128)
            nb = n // block
            ebase = t_in(jnp.arange(n, dtype=jnp.int32) * NROW)[:, 0]

            def body(carry, _):
                bdyn, brngs = carry
                if gather:
                    bxy = bdyn[i_xy]
                    a = bdyn[i_agent]

                    def cell_of(idx):
                        xy = sum(jnp.where(idx == j, bxy[:, j], 0)
                                 for j in range(4))
                        c = ((xy - bmin) >> 1) + 1
                        return jnp.clip(c[:, 0] * E.GRIDSIZE + c[:, 1],
                                        0, GRID2 - 1)[:, None, :]

                    cell = cell_of(a)
                    rows = ((cell[:, 0] >> 5) + ebase).reshape(n)
                    g128 = tab2.at[rows].get(mode="promise_in_bounds")
                    g = E.select_ball_words(
                        g128, (cell.reshape(n) & 31) * 4)
                    g = jnp.moveaxis(g.reshape(nb, block, 4), -1, 1)
                    bball = (g[:, 0:1], g[:, 1:2], g[:, 2:3], g[:, 3:4])
                else:
                    z = jnp.zeros_like(bdyn[i_agent])
                    bball = (z, z, z, z)
                bdyn, brngs, _ = fused.blocked(bdyn, brngs, bball, bnp, bms)
                return (bdyn, brngs), None

            (bdyn, brngs), _ = jax.lax.scan(body, (bdyn, brngs), None,
                                            length=n_steps)
            return bdyn, brngs, jnp.sum(brngs)
        return run

    def timed(run, steps, seed):
        rngs = sampler_init(seed, n)
        bctx, bdyn, brngs = progs.block_in(states, rngs)
        np.asarray(jnp.sum(brngs))    # land inputs
        t0 = time.perf_counter()
        _, _, chk = run(bctx, bdyn, brngs, steps)
        np.asarray(chk)               # the only real sync
        return time.perf_counter() - t0

    seeds = iter(range(100, 10000))
    for name, null_body, gather in (("full", False, True),
                                    ("nogather", False, False),
                                    ("null+gather", True, True),
                                    ("null", True, False)):
        run = build_variant(null_body, gather)
        timed(run, args.s1, 1)
        timed(run, args.s2, 2)
        t1 = min(timed(run, args.s1, next(seeds))
                 for _ in range(args.reps))
        t2 = min(timed(run, args.s2, next(seeds))
                 for _ in range(args.reps))
        per_step = (t2 - t1) / (args.s2 - args.s1)
        print(f"{name:12s} t({args.s1})={t1*1e3:7.1f} ms  "
              f"t({args.s2})={t2*1e3:7.1f} ms  per-step "
              f"{per_step*1e6:7.1f} us  "
              f"-> {n / per_step / 1e6:7.2f}M env-steps/s", flush=True)


if __name__ == "__main__":
    main()
