#!/usr/bin/env python3
"""Measure the DMA/launch floor of the fused step kernel's I/O shape.

Builds a pallas_call with the SAME input/output block windows as the real
fused step (all dyn leaves + ball + consts in, all dyn leaves out) whose
body just copies input refs to output refs. The difference between this and
the real kernel separates per-DMA/launch overhead from vector-op compute.

Usage: python tools/tpu_null_kernel.py [--envs 4096] [--block 512]

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

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=4096)
    ap.add_argument("--block", type=int, default=512)
    ap.add_argument("--steps", type=int, default=100)
    args = ap.parse_args()

    print("devices:", jax.devices(), flush=True)
    from eldorado_tpu.core import engine as E
    from eldorado_tpu.ops import step_kernel as K
    from eldorado_tpu.ops.jaxpr_opt import build_plan
    from eldorado_tpu.vec import sampler_init, vec_reset

    n, block, T = args.envs, args.block, args.steps
    nb = n // block
    states = vec_reset(123, n, 4, 3, 0, 100000)
    jax.block_until_ready(states.map_ids)
    rngs = sampler_init(7, n)

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
    uniq = [c for c in plan.pool if c.ndim > 0]
    uniq2d = [u[None] if u.ndim < 2 else u for u in uniq]
    uniq2d = [u.astype(np.int32) if u.dtype == np.bool_ else u
              for u in uniq2d]
    print(f"dyn leaves: {len(dyn)}  consts: {len(uniq2d)}", flush=True)

    n_dyn = len(feat)

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
    out_shapes = [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in ins0]

    def kernel(*refs):
        nin = len(ins0) + len(uniq2d)
        ins, outs = refs[:len(ins0)], refs[nin:]
        for r, o in zip(ins, outs):
            o[...] = r[...]

    @jax.jit
    def null_loop(ins):
        def body(ins, _):
            outs = pl.pallas_call(
                kernel,
                grid=(nb,),
                in_specs=([bspec(x.shape) for x in ins]
                          + [cspec(u.shape) for u in uniq2d]),
                out_specs=[bspec(sh.shape) for sh in out_shapes],
                out_shape=out_shapes,
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",),
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(*ins, *uniq2d)
            return tuple(outs), None
        ins, _ = jax.lax.scan(body, tuple(ins), None, length=T)
        return ins

    out = null_loop(ins0)
    jax.block_until_ready(out[0])
    t0 = time.perf_counter()
    out = null_loop(ins0)
    jax.block_until_ready(out[0])
    dt = (time.perf_counter() - t0) / T
    print(f"null kernel   : {dt*1e6:9.1f} us/step "
          f"({dt/nb*1e6:.1f} us/block, {nb} blocks)", flush=True)


if __name__ == "__main__":
    main()
