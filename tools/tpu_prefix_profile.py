#!/usr/bin/env python3
"""Prefix-timing bisection of the fused step kernel on the TPU.

Builds pallas_call kernels that evaluate only the first K nodes of the
optimised step plan (K over a sweep), reducing every live value at cut
point K into one tiny output checksum so nothing is DCE'd. The time-vs-K
curve attributes kernel wall time to plan regions.

Usage: python tools/tpu_prefix_profile.py [--envs 4096] [--block 512]
       [--cuts 0,300,600,...]
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=4096)
    ap.add_argument("--block", type=int, default=512)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--cuts", type=str, default="")
    args = ap.parse_args()

    print("devices:", jax.devices(), flush=True)
    from eldorado_tpu.core import engine as E
    from eldorado_tpu.ops import step_kernel as K
    from eldorado_tpu.ops.jaxpr_opt import build_plan
    from eldorado_tpu.vec import sampler_init, vec_reset

    n, block, T = args.envs, args.block, args.steps
    nb = n // block
    states = vec_reset(123, n, 4, 3, 0, 100000)
    jax.block_until_ready(states.map_obs)

    feat = K._feat_template(states)
    _, dyn = E.split_state(states)
    ex = [jnp.zeros((block,) + x.shape[1:], x.dtype) for x in dyn]
    ex.append(jnp.zeros((block,), jnp.int32))
    for _ in range(3):
        ex.append(jnp.zeros((block, 4, E.N_BALL), jnp.int32))
    ex.append(jnp.zeros((block,), jnp.int32))
    ex.append(jnp.zeros((block,), jnp.int32))
    body = functools.partial(K._step_values, feat, "storage")
    cj = jax.make_jaxpr(body)(*ex)
    plan = build_plan(cj, block)
    N = len(plan.nodes)
    print(f"plan: {N} nodes", flush=True)

    inline_consts, hoist_idx, uniq = [], {}, []
    for i, c in enumerate(plan.pool):
        if c.ndim == 0:
            v = np.int32(c) if c.dtype == np.bool_ else c[()]
            inline_consts.append(v)
        else:
            inline_consts.append(None)
            hoist_idx[i] = len(uniq)
            uniq.append(c)
    uniq2d = [u[None] if u.ndim < 2 else u for u in uniq]
    uniq2d = [u.astype(np.int32) if u.dtype == np.bool_ else u
              for u in uniq2d]

    n_in = len(ex)
    in_meta = ([(len(f) == 0, d == jnp.bool_) for _, f, d in feat]
               + [(True, False), (False, False), (False, False),
                  (False, False), (True, False), (True, False)])

    def t_in(x):
        if x.ndim == 1:
            return x.reshape(nb, 1, block)
        x = x.reshape((nb, block) + x.shape[1:])
        return jnp.moveaxis(x, 1, -1)

    def bspec(shape):
        bs = (None,) + tuple(int(d) for d in shape[1:])
        return pl.BlockSpec(bs, lambda i: (i,) + (0,) * (len(bs) - 1),
                            memory_space=pltpu.VMEM)

    def cspec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    ins0 = [t_in(x.astype(jnp.int32) if x.dtype == jnp.bool_ else x)
            for x in dyn]
    rngs = sampler_init(7, n)
    ins0.append(t_in(rngs))
    ball = jax.vmap(E._ball_cells)(states)
    for part in ball:
        ins0.append(t_in(part))
    ins0.append(t_in(states.n_players))
    ins0.append(t_in(states.max_steps))

    def make_prefix(cut):
        """Kernel evaluating plan.nodes[:cut]; checksum of values live at
        the cut (consumed by nodes >= cut or plan outputs)."""
        nodes = plan.nodes[:cut]
        defined = set()
        for nd in nodes:
            defined.update(nd.outvars)
        live = set()
        for nd in plan.nodes[cut:]:
            for r in nd.inrefs:
                if r[0] == "v" and r[1] in defined:
                    live.add(r[1])
        for r in plan.outrefs:
            if r[0] == "v" and r[1] in defined:
                live.add(r[1])
        # cap the checksum set to bound the reduce cost
        live = list(live)[:64]

        class P:
            pass
        pp = P()
        pp.nodes = nodes
        pp.invars = plan.invars
        pp.outrefs = [("v", v) for v in live]

        def kernel2(*refs):
            ins = refs[:n_in]
            crefs = refs[n_in:n_in + len(uniq)]
            out = refs[n_in + len(uniq)]
            vals = []
            for r, (scal, is_bool) in zip(ins, in_meta):
                v = r[...]
                if scal:
                    v = v[0]
                vals.append(v)
            hoisted = {}
            for i, j in hoist_idx.items():
                v = crefs[j][...][0] if uniq[j].ndim < 2 else crefs[j][...]
                hoisted[i] = v
            results = [p[0] for p in
                       K._eval_kernel(pp, block, inline_consts, hoisted,
                                      *vals)]
            acc = jnp.zeros((block,), jnp.int32)
            for v in results:
                v = v.astype(jnp.int32) if v.dtype != jnp.float32 \
                    else v.astype(jnp.int32)
                while v.ndim > 1:
                    v = jnp.sum(v, axis=0, dtype=jnp.int32)
                if v.ndim == 0:
                    v = jnp.broadcast_to(v, (block,))
                acc = acc + v
            out[...] = acc[None, :]

        out_shape = jax.ShapeDtypeStruct((nb, 1, block), jnp.int32)

        @jax.jit
        def run(ins):
            def step(c, _):
                o = pl.pallas_call(
                    kernel2,
                    grid=(nb,),
                    in_specs=([bspec(x.shape) for x in ins]
                              + [cspec(u.shape) for u in uniq2d]),
                    out_specs=bspec(out_shape.shape),
                    out_shape=out_shape,
                    compiler_params=pltpu.CompilerParams(
                        dimension_semantics=("arbitrary",),
                        vmem_limit_bytes=100 * 1024 * 1024),
                )(*ins, *uniq2d)
                return c + o[0, 0, 0], None
            acc, _ = jax.lax.scan(step, jnp.zeros((), jnp.int32), None,
                                  length=T)
            return acc

        return run

    if args.cuts:
        cuts = [int(c) for c in args.cuts.split(",")]
    else:
        cuts = [0, N // 8, N // 4, 3 * N // 8, N // 2, 5 * N // 8,
                3 * N // 4, 7 * N // 8, N]
    prev_t = None
    for cut in cuts:
        try:
            run = make_prefix(cut)
            t0 = time.perf_counter()
            jax.block_until_ready(run(ins0))
            tc = time.perf_counter() - t0
            t0 = time.perf_counter()
            jax.block_until_ready(run(ins0))
            dt = (time.perf_counter() - t0) / T
            delta = "" if prev_t is None else \
                f"  (+{(dt - prev_t) * 1e6:7.1f} us)"
            prev_t = dt
            print(f"cut {cut:5d}: {dt*1e6:9.1f} us/step{delta}  "
                  f"[compile {tc:.0f}s]", flush=True)
        except Exception as e:
            print(f"cut {cut:5d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            prev_t = None


if __name__ == "__main__":
    main()
