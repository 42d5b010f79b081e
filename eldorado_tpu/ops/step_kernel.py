"""Pallas fused step kernel: sampler + full game step in one TPU program.

The XLA path (vec.rollout) emits ~5.8k HLO ops per lockstep step; even
scatter-free and carry-split, per-step cost is dominated by op scheduling
(~1 ms fixed + ~1 us/env at large batches). This kernel collapses the entire
sample+step into a single Mosaic program over env blocks, so the whole step
is one kernel launch plus one XLA pregather of map cells.

Design:
* The game logic is NOT reimplemented: the kernel body calls
  `jax.vmap(engine.step_core)` / `jax.vmap(engine.sample_action)` on the
  values it loads — Mosaic lowers exactly the one-hot/elementwise/matmul ops
  the engine is already written in (the engine deliberately avoids
  scatter/gather/cumsum; see engine.py docstring).
* Map reads are the per-player 19-cell 2-hop "ball" (engine._ball_cells),
  gathered by XLA before the kernel from the current positions. The kernel
  never sees the 48x48x7 map.
* All dynamic state leaves are reshaped to (N, F) 2-D buffers and blocked
  over the env axis; the only step-static env inputs are n_players /
  max_steps. Every table/iota constant the traced logic closes over is
  hoisted into a (deduplicated) replicated kernel input via
  `jax.closure_convert` — Pallas forbids captured array constants.

The kernel is bit-identical to the XLA path by construction (same traced
logic), validated in tests/test_step_kernel.py against the XLA step and the
golden trajectory corpus.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import engine as E

_i32 = jnp.int32


def _feat_template(states):
    _, dyn = E.split_state(states)
    return [(name, leaf.shape[1:], leaf.dtype)
            for name, leaf in zip(E.DYN_FIELDS, dyn)]


def _scal2d(leaf):
    """Scalar per-env leaves ride as (N, 1); everything else keeps its
    native shape (Mosaic rejects reshapes that cross the lane dim)."""
    return leaf[:, None] if leaf.ndim == 1 else leaf


def _boxed(leaf):
    """Bools cross the pallas boundary as i32 (Mosaic cannot truncate the
    i8-stored bool loads to i1)."""
    leaf = _scal2d(leaf)
    return leaf.astype(_i32) if leaf.dtype == jnp.bool_ else leaf


def _step_values(feat, mask_src, *flat):
    """Pure (values -> values) fused sample+step on one env block. Inputs
    arrive in their natural (block,)+feature shapes and dtypes; the kernel
    wrapper does all boundary canonicalisation (Mosaic-safe squeezes and
    bool<->i32 casts)."""
    n_dyn = len(feat)
    dyn = list(flat[:n_dyn])
    srng = flat[n_dyn]
    breq, bnr, bend = flat[n_dyn + 1], flat[n_dyn + 2], flat[n_dyn + 3]
    n_players = flat[n_dyn + 4]
    max_steps = flat[n_dyn + 5]

    b = srng.shape[0]
    static = (jnp.zeros((b, 1, 1, 7), jnp.uint8),   # map_obs (never read)
              jnp.zeros((b, 2), _i32),              # min_xy (never read)
              jnp.ones((b,), bool),                 # map_ok (never read)
              n_players,
              jnp.zeros((b,), _i32),                # n_pieces (never read)
              jnp.zeros((b,), _i32),                # difficulty (never read)
              max_steps)
    s = E.merge_state(static, tuple(dyn))

    if mask_src == "storage":
        oh = s.agent[:, None, None] == np.arange(4)[None, :, None]
        masks = jnp.max(
            jnp.where(oh, s.storage_masks.astype(jnp.int32),
                      jnp.zeros((), jnp.int32)), axis=1) > 0
    else:
        masks = s.sel_mask
    actions, srng, tainted = jax.vmap(E.sample_action)(srng, masks)
    s = jax.vmap(E.step_core)(s, actions, (breq, bnr, bend))
    s = s._replace(rng_tainted=s.rng_tainted | tainted)

    _, dyn_out = E.split_state(s)
    return tuple(dyn_out) + (srng, actions.astype(_i32))


_CMP_PRIMS = frozenset({"eq", "ne", "lt", "le", "gt", "ge"})
_LOGIC_PRIMS = frozenset({"and", "or", "xor"})
_SHAPE_PRIMS = frozenset({"broadcast_in_dim", "slice", "reshape",
                          "squeeze", "transpose", "concatenate", "rev"})


def _eval_boolfree(jaxpr, consts, *args):
    """eval_jaxpr with a bool-free calling convention: every bool value is
    carried as an i32 0/1 tensor.  Mosaic's apply-vector-layout pass lowers
    several i1-vector ops (selects, broadcasts, strided slices) by extending
    masks to i8 and truncating back, and ``arith.trunci`` to i1 is
    unsupported on TPU — this transform leaves i1 only as the same-shape
    result of a compare feeding directly into a select, which lowers
    natively.  Callers must pass bool leaves as i32 and get i32 back."""
    from jax.extend import core as jex_core
    env = {}

    def read(v):
        if isinstance(v, jex_core.Literal):
            if np.asarray(v.val).dtype == np.bool_:
                return jnp.asarray(np.asarray(v.val).astype(np.int32))
            return v.val
        return env[v]

    for v, c in zip(jaxpr.constvars, consts):
        env[v] = c
    for v, a in zip(jaxpr.invars, args):
        env[v] = a
    for eqn in jaxpr.eqns:
        invals = [read(v) for v in eqn.invars]
        prim = eqn.primitive
        name = prim.name
        out_bool = any(v.aval.dtype == jnp.bool_ for v in eqn.outvars)
        if name in _CMP_PRIMS:
            out = [prim.bind(*invals, **eqn.params).astype(_i32)]
        elif name == "not":
            out = [invals[0] ^ 1]
        elif name in _LOGIC_PRIMS and out_bool:
            out = [prim.bind(*invals, **eqn.params)]
        elif name in _SHAPE_PRIMS and out_bool:
            out = [prim.bind(*invals, **eqn.params)]
        elif name == "select_n" and eqn.invars[0].aval.dtype == jnp.bool_:
            out = [prim.bind(invals[0] != 0, *invals[1:], **eqn.params)]
        elif name == "convert_element_type":
            src_bool = eqn.invars[0].aval.dtype == jnp.bool_
            if eqn.params["new_dtype"] == jnp.bool_:
                out = [invals[0] if src_bool
                       else (invals[0] != 0).astype(_i32)]
            elif src_bool:
                out = [invals[0].astype(eqn.params["new_dtype"])]
            else:
                out = [prim.bind(*invals, **eqn.params)]
        elif name in ("pjit", "closed_call", "core_call", "jit"):
            sub = eqn.params["jaxpr"]
            out = _eval_boolfree(sub.jaxpr, sub.consts, *invals)
        else:
            if out_bool or any(
                    getattr(v, "dtype", None) == jnp.bool_ for v in invals):
                raise NotImplementedError(
                    f"boolfree transform: unhandled primitive {name}")
            out = prim.bind(*invals, **eqn.params)
            if not prim.multiple_results:
                out = [out]
        for v, o in zip(eqn.outvars, out):
            env[v] = o
    return [read(v) for v in jaxpr.outvars]


def make_fused_step(states, mask_src: str = "storage", block: int = 256,
                    interpret: bool = False, debug: bool = False):
    """Build a (states, srngs) -> (states, srngs, actions) fused step for
    this batch shape. ``block`` envs per kernel instance (grid over
    N/block)."""
    n = int(states.rng.shape[0])
    block = min(block, n)
    assert n % block == 0, (n, block)
    feat = _feat_template(states)
    n_dyn = len(feat)

    # ---- trace once on a block to extract the hoisted constants ----------
    _, dyn = E.split_state(states)
    ex = [jnp.zeros((block,) + x.shape[1:], x.dtype) for x in dyn]
    ex.append(jnp.zeros((block,), jnp.int32))
    for _ in range(3):
        ex.append(jnp.zeros((block, 4, E.N_BALL), _i32))
    ex.append(jnp.zeros((block,), _i32))
    ex.append(jnp.zeros((block,), _i32))
    body = functools.partial(_step_values, feat, mask_src)
    # make_jaxpr exposes *every* captured constant (closure_convert lifts
    # only inexact dtypes); the kernel then re-evaluates the jaxpr with the
    # constants bound to replicated kernel inputs.
    closed_jaxpr = jax.make_jaxpr(body)(*ex)
    consts = closed_jaxpr.consts

    # dedupe identical constant arrays (the triangular cumsum matmuls alone
    # appear ~30x)
    uniq, remap = [], []
    seen = {}
    for c in consts:
        c = np.asarray(c)
        key = (c.dtype.str, c.shape, c.tobytes())
        if key not in seen:
            seen[key] = len(uniq)
            uniq.append(c)
        remap.append(seen[key])
    uniq2d = [u[None] if u.ndim < 2 else u for u in uniq]
    uniq2d = [u.astype(np.int32) if u.dtype == np.bool_ else u
              for u in uniq2d]

    n_in = len(ex)

    in_meta = ([(len(f) == 0, d == jnp.bool_) for _, f, d in feat]
               + [(True, False), (False, False), (False, False),
                  (False, False), (True, False), (True, False)])

    def kernel(*refs):
        ins = refs[:n_in]
        crefs = refs[n_in:n_in + len(uniq)]
        outs = refs[n_in + len(uniq):]
        # boolfree convention: bool leaves stay i32 0/1 through the whole
        # jaxpr evaluation (see _eval_boolfree) — no i1 loads/stores at all.
        vals = []
        for r, (scal, is_bool) in zip(ins, in_meta):
            v = r[...]
            if scal:
                v = v[:, 0]          # i32 squeeze (Mosaic-safe)
            vals.append(v)
        cvals = []
        for i in remap:
            v = crefs[i][...][0] if uniq[i].ndim < 2 else crefs[i][...]
            cvals.append(v)
        results = _eval_boolfree(closed_jaxpr.jaxpr, cvals, *vals)
        for r, v, (scal, is_bool) in zip(outs, results,
                                         in_meta[:n_dyn] + [(True, False),
                                                            (False, False)]):
            if v.dtype == jnp.bool_:
                v = v.astype(_i32)
            if scal:
                v = v[:, None]       # i32 minor insert (Mosaic-safe)
            r[...] = v

    def bspec(shape):
        bs = (block,) + tuple(int(d) for d in shape[1:])
        nd = len(bs)
        return pl.BlockSpec(bs, lambda i, _nd=nd: (i,) + (0,) * (_nd - 1),
                            memory_space=pltpu.VMEM)

    def cspec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    out_shapes_full = ([jax.ShapeDtypeStruct(
                            _scal2d(x).shape,
                            _i32 if x.dtype == jnp.bool_ else x.dtype)
                        for x in dyn]
                       + [jax.ShapeDtypeStruct((n, 1), jnp.int32),
                          jax.ShapeDtypeStruct((n, 5), _i32)])

    def fused(states, srngs):
        ball = jax.vmap(E._ball_cells)(states)  # XLA gather from the map
        _, dyn = E.split_state(states)
        ins = [_boxed(x) for x in dyn]
        ins.append(srngs[:, None])
        for part in ball:
            ins.append(part)
        ins.append(states.n_players[:, None])
        ins.append(states.max_steps[:, None])

        outs = pl.pallas_call(
            kernel,
            grid=(n // block,),
            in_specs=([bspec(x.shape) for x in ins]
                      + [cspec(u.shape) for u in uniq2d]),
            out_specs=[bspec(sh.shape) for sh in out_shapes_full],
            out_shape=out_shapes_full,
            interpret=interpret,
            debug=debug,
            compiler_params=None if interpret else pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
        )(*ins, *uniq2d)

        new_dyn = []
        for o, (_, fshape, fdtype) in zip(outs[:n_dyn], feat):
            if fdtype == jnp.bool_:
                o = o != 0
            if len(fshape) == 0:
                o = o[:, 0]
            new_dyn.append(o)
        new_dyn = tuple(new_dyn)
        static, _ = E.split_state(states)
        new_states = E.merge_state(static, new_dyn)
        return new_states, outs[n_dyn][:, 0], outs[n_dyn + 1]

    return fused
