#!/usr/bin/env python3
"""Decompose kernel_rollout per-step time on TPU (ball-table design).

Variants (true dependency chains, 100-step scan):
  A real    : actual kernel_rollout (gathers + traj outputs)
  B nogather: blocked carry cycling through the kernel, constant ball rows
              (gather+idx math hoisted) — kernel + carry cost
  C notraj  : real body (idx math + 5 gathers + stack) but no per-step
              traj emission
  D noemit  : like C plus traj emission — isolates scan-stacking cost
              (should equal A minus end transposes)

Usage: python tools/tpu_carry_probe.py [--envs 4096] [--block 256]

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


def timeit(fn, *args, T=1):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / T


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=4096)
    ap.add_argument("--block", type=int, default=256)
    ap.add_argument("--steps", type=int, default=100)
    args = ap.parse_args()
    n, block, T = args.envs, args.block, args.steps

    print("devices:", jax.devices(), flush=True)
    from eldorado_tpu.core import engine as E
    from eldorado_tpu.ops.step_kernel import make_fused_step
    from eldorado_tpu.vec import kernel_rollout, sampler_init, vec_reset

    states = vec_reset(123, n, 4, 3, 0, 100000)
    jax.block_until_ready(states.map_ids)
    rngs = sampler_init(7, n)

    def real(states, rngs):
        return kernel_rollout(states, rngs, T, block=block)
    t = timeit(real, states, rngs, T=T)
    print(f"A real    : {t*1e6:9.1f} us/step ({n/t/1e6:.2f}M steps/s)",
          flush=True)

    fused = make_fused_step(states, "storage", block)
    t_in = fused.t_in
    GRID2 = E.GRIDSIZE * E.GRIDSIZE
    i_xy = E.DYN_FIELDS.index("player_xy")
    i_agent = E.DYN_FIELDS.index("agent")
    i_done = E.DYN_FIELDS.index("done")
    i_rew = E.DYN_FIELDS.index("rewards")
    i_agent = E.DYN_FIELDS.index("agent")

    def make_run(gather, emit):
        @jax.jit
        def run(states, rngs):
            _, dyn0 = E.split_state(states)
            tab = jnp.concatenate(
                jax.vmap(E.pack_ball_word_table)(states.map_ids),
                axis=1).reshape(-1)
            bdyn0 = tuple(
                t_in(x.astype(jnp.int32) if x.dtype == jnp.bool_ else x)
                for x in dyn0)
            bnp = t_in(states.n_players)
            bms = t_in(states.max_steps)
            bmin = t_in(states.min_xy)
            ebase = t_in(jnp.arange(n, dtype=jnp.int32) * (4 * GRID2))
            words0 = jax.vmap(E.ball_words)(states)
            const_rows = tuple(t_in(w) for w in words0)

            def body(carry, _):
                bdyn, brngs = carry
                if gather:
                    bxy = bdyn[i_xy]
                    a = bdyn[i_agent]
                    q = jnp.where(a + 1 >= bnp, 0, a + 1)

                    def cell_of(idx):
                        xy = sum(jnp.where(idx == j, bxy[:, j], 0)
                                 for j in range(4))
                        c = ((xy - bmin) >> 1) + 1
                        return (jnp.clip(c[:, 0] * E.GRIDSIZE + c[:, 1],
                                         0, GRID2 - 1)
                                + ebase[:, 0])[:, None, :]

                    cp, cq = cell_of(a), cell_of(q)
                    gidx = jnp.concatenate(
                        [cp, cp + GRID2, cp + 2 * GRID2,
                         cq + 3 * GRID2], axis=1)
                    g = tab.at[gidx].get(mode="promise_in_bounds")
                    brows = (g[:, 0:1], g[:, 1:2], g[:, 2:3], g[:, 3:4])
                else:
                    brows = const_rows
                bdyn, brngs, bact = fused.blocked(bdyn, brngs, brows,
                                                  bnp, bms)
                out = ((bact, bdyn[i_done], bdyn[i_rew], bdyn[i_agent])
                       if emit else None)
                return (bdyn, brngs), out

            (bdyn, brngs), traj = jax.lax.scan(
                body, (bdyn0, t_in(rngs)), None, length=T)
            return bdyn[0]
        return run

    for label, gather, emit in [("B nogather", False, False),
                                ("C notraj  ", True, False),
                                ("D noemit  ", True, True)]:
        t = timeit(make_run(gather, emit), states, rngs, T=T)
        print(f"{label}: {t*1e6:9.1f} us/step", flush=True)


if __name__ == "__main__":
    main()
