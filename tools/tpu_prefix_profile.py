#!/usr/bin/env python3
"""Prefix-timing bisection of the fused step kernel on the TPU.

Builds pallas_call kernels that evaluate only the first K nodes of the
optimised step plan (K over a sweep), reducing every value live at cut
point K into one tiny checksum so nothing is DCE'd. The time-vs-K curve
attributes kernel wall time to plan regions.

Measurement notes (see tools/tpu_true_step_cost.py): host
materialisation is the only real barrier through the device tunnel, the
tunnel memoises identical dispatches (fresh inputs per timed call), and
a carry-dependence is threaded into the kernel input so XLA cannot
hoist the loop-invariant call out of the timing scan. Per-call cost is
obtained by differencing two scan lengths.

Usage: python tools/tpu_prefix_profile.py [--envs 4096] [--block 512]
       [--cuts 0,300,...]
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

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ["JAX_COMPILATION_CACHE_DIR"])

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=4096)
    ap.add_argument("--block", type=int, default=512)
    ap.add_argument("--s1", type=int, default=100)
    ap.add_argument("--s2", type=int, default=400)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--cuts", type=str, default="")
    args = ap.parse_args()

    print("devices:", jax.devices(), flush=True)
    from eldorado_tpu.core import engine as E
    from eldorado_tpu.ops import step_kernel as K
    from eldorado_tpu.ops.jaxpr_opt import build_plan
    from eldorado_tpu.vec import sampler_init, vec_reset

    n, block = args.envs, args.block
    nb = n // block
    states = vec_reset(123, n, 4, 3, 0, 100000)

    feat = K._feat_template(states)
    _, dyn = E.split_state(states)
    ex = [jnp.zeros((block,) + x.shape[1:], x.dtype) for x in dyn]
    for _ in range(7):   # srng + 4 ball words + n_players + max_steps
        ex.append(jnp.zeros((block,), jnp.int32))
    body = functools.partial(K._step_values, feat, "storage", False)
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
    n_dyn = len(feat)
    in_meta = ([(len(f) == 0, d == jnp.bool_) for _, f, d in feat]
               + [(True, False)] * 7)

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
    words = jax.vmap(E.ball_words)(states)
    for part in words:
        ins0.append(t_in(part))
    ins0.append(t_in(states.n_players))
    ins0.append(t_in(states.max_steps))
    i_srng = n_dyn

    def make_prefix(cut):
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
                v = v.astype(jnp.int32)
                while v.ndim > 1:
                    v = jnp.sum(v, axis=0, dtype=jnp.int32)
                if v.ndim == 0:
                    v = jnp.broadcast_to(v, (block,))
                acc = acc + v
            out[...] = acc[None, :]

        out_shape = jax.ShapeDtypeStruct((nb, 1, block), jnp.int32)

        @functools.partial(jax.jit, static_argnums=(1,))
        def run(ins, steps):
            def step(c, _):
                # thread the carry into an input so XLA cannot hoist the
                # loop-invariant kernel call out of the scan
                jiggled = list(ins)
                jiggled[i_srng] = ins[i_srng] + (c & 1)
                o = pl.pallas_call(
                    kernel2,
                    grid=(nb,),
                    in_specs=([bspec(x.shape) for x in jiggled]
                              + [cspec(u.shape) for u in uniq2d]),
                    out_specs=bspec(out_shape.shape),
                    out_shape=out_shape,
                    compiler_params=pltpu.CompilerParams(
                        dimension_semantics=("arbitrary",),
                        vmem_limit_bytes=100 * 1024 * 1024),
                )(*jiggled, *uniq2d)
                return c + o[0, 0, 0], None
            acc, _ = jax.lax.scan(step, jnp.zeros((), jnp.int32), None,
                                  length=steps)
            return acc

        return run

    if args.cuts:
        cuts = [int(c) for c in args.cuts.split(",")]
    else:
        cuts = [0, N // 8, N // 4, 3 * N // 8, N // 2, 5 * N // 8,
                3 * N // 4, 7 * N // 8, N]

    seeds = iter(range(1000, 100000))

    def timed(run, steps):
        ts = []
        for _ in range(args.reps):
            rr = sampler_init(next(seeds), n)
            ii = list(ins0)
            ii[i_srng] = t_in(rr)
            np.asarray(jnp.sum(ii[i_srng]))
            t0 = time.perf_counter()
            np.asarray(run(ii, steps))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    prev = None
    for cut in cuts:
        try:
            run = make_prefix(cut)
            timed(run, args.s1)
            timed(run, args.s2)
            t1 = timed(run, args.s1)
            t2 = timed(run, args.s2)
            per = (t2 - t1) / (args.s2 - args.s1)
            delta = "" if prev is None else f"  (+{(per - prev)*1e6:7.1f})"
            print(f"cut {cut:5d}  per-call {per*1e6:8.1f} us{delta}",
                  flush=True)
            prev = per
        except Exception as e:
            print(f"cut {cut:5d}  FAILED: {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
