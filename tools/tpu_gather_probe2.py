#!/usr/bin/env python3
"""Bisect the 2.5ms/step cost seen in tpu_carry_probe C (flat ball gather
with real xy index math) given tpu_gather_probe shows raw serialized
gathers of the same size cost ~2.5us."""
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

N = 4096
BLOCK = 256
NB = N // BLOCK
T = 100


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / T


def main():
    print("devices:", jax.devices(), flush=True)
    from eldorado_tpu.core import engine as E
    from eldorado_tpu.ops.step_kernel import make_fused_step
    from eldorado_tpu.vec import sampler_init, vec_reset

    states = vec_reset(123, N, 4, 3, 0, 100000)
    jax.block_until_ready(states.map_obs)
    rngs = sampler_init(7, N)
    fused = make_fused_step(states, "storage", BLOCK)
    t_in = fused.t_in
    GRID2 = E.GRIDSIZE * E.GRIDSIZE
    M = N * (GRID2 + 1)
    ball_off = jnp.asarray(E._BALL).reshape(1, 1, E.N_BALL, 2, 1)
    rand_table = jnp.asarray(
        np.random.default_rng(0).integers(0, 1 << 20, M, dtype=np.int32))

    def xy_body(bxy, bmin, s):
        tgt = (bxy + (s[:, :, None, :] & 1))[:, :, None, :, :] + ball_off
        d = tgt - bmin[:, None, None, :, :]
        idx = jnp.where(d >= 0, (d >> 1) + 1, jnp.where(d == -1, 1, 0))
        ix, iy = idx[:, :, :, 0, :], idx[:, :, :, 1, :]
        ok = ((ix >= 0) & (ix < E.GRIDSIZE)
              & (iy >= 0) & (iy < E.GRIDSIZE))
        return jnp.where(ok, ix * E.GRIDSIZE + iy, GRID2)

    def run_case(label, use_xy_math, table_kind, gather):
        @jax.jit
        def run(states, rngs):
            plane = (rand_table if table_kind == "rand" else
                     jax.vmap(E.pack_ball_plane)(states.map_obs).reshape(-1))
            bxy = t_in(states.player_xy)
            bmin = t_in(states.min_xy)
            ebase = t_in(jnp.arange(N, dtype=jnp.int32)
                         * (GRID2 + 1))[:, None]
            seed = t_in(rngs)

            def body(carry, _):
                s, acc = carry
                s = s * 75 + 74
                if use_xy_math:
                    flat = xy_body(bxy, bmin, s)
                    gidx = flat + ebase
                else:
                    gidx = ((s[:, :, None, :] * 7 + acc)
                            & 0x7FFFFF) % M * jnp.ones(
                                (1, 4, E.N_BALL, 1), jnp.int32)
                if gather:
                    g = plane.at[gidx].get(mode="promise_in_bounds")
                    acc = acc + g.sum(dtype=jnp.int32)
                else:
                    acc = acc + gidx.sum(dtype=jnp.int32)
                return (s, acc), None

            (s, acc), _ = jax.lax.scan(
                body, (seed, jnp.zeros((), jnp.int32)), None, length=T)
            return acc
        t = timeit(run, states, rngs)
        print(f"{label:44s}: {t*1e6:9.1f} us/step", flush=True)

    run_case("H xy-math + plane gather (carry-probe C)", True, "plane", True)
    run_case("I xy-math, NO gather", True, "plane", False)
    run_case("J xy-math + rand-table gather", True, "rand", True)
    run_case("K lcg idx (same shape) + plane gather", False, "plane", True)


if __name__ == "__main__":
    main()
