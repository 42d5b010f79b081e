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
* Map reads are engine.ball_words' 4 packed i32 words (the current
  agent's 19-cell 2-hop ball + their own 1-hop word, 5-bit cell-type
  ids; the next agent's 1-hop data rides the in-state w3_cache),
  gathered by XLA before the kernel as ONE contiguous table row at the
  agent's cell. The kernel never sees the 48x48x7 map.
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


def _scal2d_t(leaf):
    """Scalar per-env leaves ride as (1, N) — one sublane row with envs in
    the lane dim; everything else keeps its env-minor shape."""
    return leaf[None, :] if leaf.ndim == 1 else leaf


def _boxed_t(leaf):
    """Bools cross the pallas boundary as i32 (Mosaic cannot truncate the
    i8-stored bool loads to i1)."""
    leaf = _scal2d_t(leaf)
    return leaf.astype(_i32) if leaf.dtype == jnp.bool_ else leaf


def _step_values(feat, mask_src, gate_dead, *flat):
    """Pure (values -> values) fused sample+step on one env block, traced in
    the ordinary env-MAJOR layout (batch leading).  The kernel evaluates the
    resulting jaxpr through `_eval_kernel`, which re-lays every batched value
    out env-minor — the trace stays the proven bit-exact one; only the
    storage layout inside the kernel changes."""
    n_dyn = len(feat)
    dyn = list(flat[:n_dyn])
    srng = flat[n_dyn]
    # the map read arrives as engine.ball_words' 4 packed i32 words per
    # env (current agent's 19-cell ball + their own 1-hop word; the next
    # agent's 1-hop data rides the in-state w3_cache): the rollout's
    # single row gather feeds the kernel directly, and the engine
    # decodes with static shifts/masks
    ball = tuple(flat[n_dyn + 1:n_dyn + 5])
    n_players = flat[n_dyn + 5]
    max_steps = flat[n_dyn + 6]

    b = srng.shape[0]
    static = (jnp.zeros((b, 1), _i32),              # map_ids (never read)
              jnp.zeros((b, 2), _i32),              # min_xy (never read)
              jnp.ones((b,), bool),                 # map_ok (never read)
              jnp.zeros((b,), bool),                # map_overflow (never read)
              n_players,
              jnp.zeros((b,), _i32),                # n_pieces (never read)
              jnp.zeros((b,), _i32),                # difficulty (never read)
              max_steps)
    s = E.merge_state(static, tuple(dyn))

    s, srng, actions = jax.vmap(
        lambda a, b, c: E.fused_sample_step(a, b, c, mask_src, gate_dead))(
            s, srng, ball)

    _, dyn_out = E.split_state(s)
    return tuple(dyn_out) + (srng, actions.astype(_i32))


_CMP_PRIMS = frozenset({"eq", "ne", "lt", "le", "gt", "ge"})
_ELTWISE_PRIMS = frozenset({
    "add", "sub", "mul", "div", "rem", "neg", "sign", "max", "min",
    "and", "or", "xor", "shift_left", "shift_right_logical",
    "shift_right_arithmetic", "select_n", "abs", "floor", "ceil", "round",
    "exp", "log", "integer_pow", "pow",
})
_CALL_PRIMS = frozenset({"pjit", "closed_call", "core_call", "jit"})

_DEBUG_SHAPES = False  # set True to assert rotated-layout invariants per eqn
_DEBUG_PROD = {}


def _rot(d, rank):
    """Original dim index -> index after rotating dim 0 to last."""
    return rank - 1 if d == 0 else d - 1


def _align_eltwise(invals, inbat, eqn):
    """Elementwise/compare/select prims use implicit numpy trailing-dim
    broadcasting.  Batched operands are stored rotated (env last), so an
    unbatched non-scalar operand must be re-aligned: right-align it to the
    original output rank (its leading slot is never the batch) and rotate
    the padded shape the same way."""
    if not any(inbat):
        return invals
    orank = max(len(v.aval.shape) for v in eqn.outvars)
    fixed = []
    for val, bat in zip(invals, inbat):
        ndim = np.ndim(val)
        if bat or ndim == 0 or ndim == orank == 1:
            fixed.append(val)
        else:
            s = tuple(np.shape(val))
            pad = (1,) * (orank - len(s)) + s
            assert pad[0] == 1, (pad, "const aligned with the batch axis")
            fixed.append(jnp.reshape(val, pad[1:] + (1,)))
    return fixed


def _eval_kernel(plan, block, inline_consts, hoisted, *args):
    """Evaluate the optimised step plan (ops/jaxpr_opt.py: the env-major
    step jaxpr flattened, constant-folded, CSE'd and DCE'd) with two
    value-level transforms that Mosaic needs, without re-tracing the
    (bit-exactness-proven) game logic:

    * **bool-free**: every bool is carried as an i32 0/1 tensor.  Mosaic's
      apply-vector-layout lowers i1-vector selects/broadcasts/slices via an
      i8 extension + `arith.trunci` back to i1, and that truncation is
      unsupported — here i1 exists only as the same-shape result of a
      compare feeding a select, which lowers natively.
    * **batch-minor**: every batched value (leading dim == ``block`` in the
      original trace) is stored with the env axis rotated to LAST, so the
      128 lanes of each (8,128) vreg tile hold 128 envs at full utilisation.
      Env-major (block,4,5,21) piles tile at ~4% lane use; env-minor
      (4,5,21,block) at 100%.  `vmap(in_axes=-1)` cannot produce this form —
      JAX's batching rules canonicalise batch dims towards axis 0, emitting
      lane-crossing relayouts — so the rotation is applied here, per
      primitive, with dimension parameters remapped.

    Constants stay unrotated (none has a ``block``-sized axis — asserted at
    build time).  Inputs/outputs use the rotated layout for rank>=2 batched
    leaves ((b,) scalars are rotation-invariant).

    ``inline_consts``/``hoisted`` resolve the plan's ("k", i) refs: scalars
    are inlined into the program (Mosaic allows scalar constants), arrays
    arrive as replicated VMEM refs.
    """
    env = {}

    def read(ref):
        if ref[0] == "k":
            i = ref[1]
            v = inline_consts[i]
            return (v if v is not None else hoisted[i]), False
        return env[ref[1]]

    def _ones_aval(aval):
        s = tuple(getattr(aval, "shape", ()))
        return (len(s) >= 2 and s[0] == block
                and all(d == 1 for d in s[1:]))

    def _mat(v, aval):
        # re-expand an ALIASED batched scalar (see broadcast_in_dim
        # below) to its rotated aval shape for structural consumers
        if np.ndim(v) == 1 and len(aval.shape) >= 2:
            return jnp.reshape(v, (1,) * (len(aval.shape) - 1) + (block,))
        return v

    for v, a in zip(plan.invars, args):
        env[v] = a if isinstance(a, tuple) else (a, True)

    for eqn in plan.nodes:
        pairs = [read(r) for r in eqn.inrefs]
        invals = [p[0] for p in pairs]
        inbat = [p[1] for p in pairs]
        prim = eqn.prim
        name = prim.name
        params = eqn.params
        if _DEBUG_SHAPES:
            for aval, (val, bat) in zip(eqn.in_avals, pairs):
                av = tuple(getattr(aval, "shape", ()))
                vs = tuple(np.shape(val))
                exp = (av[1:] + (av[0],)) if (bat and len(av) >= 2) else av
                assert vs == exp, (
                    f"{name}: aval {av} bat {bat} got {vs}\neqn: {name} "
                    f"{params}")
        out_bool = any(v.aval.dtype == jnp.bool_ for v in eqn.outvars)
        batched = any(inbat)
        # ALIASED batched scalars: a rank-1 (block,) value whose aval is
        # (block, 1, ..., 1) — produced by the broadcast_in_dim /
        # reshape-to-all-ones elision below (no Mosaic op emitted for
        # those nodes; _select/_merge's per-leaf pred reshapes are ~190
        # such nodes per step). Eltwise ops whose OUTPUT is all-ones run
        # on (block,) values; structural ops re-expand via _mat.
        any_alias = any(b and np.ndim(v) == 1 and len(av.shape) >= 2
                        for v, b, av in zip(invals, inbat, eqn.in_avals))
        out_ones = (len(eqn.outvars) == 1
                    and _ones_aval(eqn.outvars[0].aval))

        def _squash(v):
            # ones-regime operand -> (block,) or scalar
            if np.ndim(v) <= 1:
                return v
            s = np.shape(v)
            if int(np.prod(s[:-1])) == 1 and s[-1] == block:
                return jnp.reshape(v, (block,))
            return jnp.reshape(v, ())

        def _elt_ins():
            a = _align_eltwise(invals, inbat, eqn)
            if any_alias and out_ones:
                return [_squash(v) for v in a]
            if any_alias:
                return [_mat(v, av) if (b and np.ndim(v) == 1
                                        and len(av.shape) >= 2) else v
                        for v, b, av in zip(a, inbat, eqn.in_avals)]
            return a

        if name in _CMP_PRIMS:
            out = [prim.bind(*_elt_ins(), **params).astype(_i32)]
        elif name == "not":
            # bool-free convention: a BOOL not is x ^ 1 on its i32 0/1
            # carrier; a genuine integer not is the bitwise complement
            # (the packed-mask word algebra uses ~word)
            if eqn.in_avals[0].dtype == jnp.bool_:
                out = [invals[0] ^ 1]
            else:
                out = [~invals[0]]
        elif name == "select_n" and eqn.in_avals[0].dtype == jnp.bool_:
            a = _elt_ins()
            out = [prim.bind(a[0] != 0, *a[1:], **params)]
        elif name in _ELTWISE_PRIMS:
            out = [prim.bind(*_elt_ins(), **params)]
        elif name == "convert_element_type":
            src_bool = eqn.in_avals[0].dtype == jnp.bool_
            if params["new_dtype"] == jnp.bool_:
                out = [invals[0] if src_bool
                       else (invals[0] != 0).astype(_i32)]
            elif src_bool:
                out = [invals[0].astype(params["new_dtype"])]
            else:
                out = [prim.bind(*invals, **params)]
        elif name == "broadcast_in_dim":
            oshape = tuple(params["shape"])
            obat = batched or (len(oshape) > 0 and oshape[0] == block)
            if not obat:
                out = [prim.bind(*invals, **params)]
            elif (len(oshape) >= 2 and oshape[0] == block
                  and all(d == 1 for d in oshape[1:]) and inbat[0]):
                # batched scalar -> (block, 1, ..., 1): ALIAS (no op);
                # the value stays (block,)
                out = [invals[0] if np.ndim(invals[0]) == 1
                       else jnp.reshape(invals[0], (block,))]
            else:
                r = len(oshape)
                assert oshape[0] == block, (oshape, block)
                nshape = oshape[1:] + (oshape[0],)
                obd = params["broadcast_dimensions"]
                if inbat[0]:
                    # batched operand: its orig dim 0 (batch) sits last in
                    # the rotated layout and maps to the rotated batch slot
                    assert obd and obd[0] == 0, (obd,)
                    val = _mat(invals[0], eqn.in_avals[0])
                    nbd = tuple(o - 1 for o in obd[1:]) + (r - 1,)
                else:
                    # constant operand broadcast INTO the batch: feature
                    # dims shift down one; nothing maps to the batch slot
                    assert 0 not in obd, (obd,)
                    val = invals[0]
                    nbd = tuple(o - 1 for o in obd)
                out = [jax.lax.broadcast_in_dim(val, nshape, nbd)]
        elif name in ("reduce_sum", "reduce_max", "reduce_min",
                      "reduce_prod", "reduce_and", "reduce_or"):
            if not batched:
                out = [prim.bind(*invals, **params)]
            else:
                axes = params["axes"]
                assert 0 not in axes, "batch axis is never reduced"
                out = [prim.bind(_mat(invals[0], eqn.in_avals[0]),
                                 **{**params,
                                    "axes": tuple(a - 1 for a in axes)})]
        elif name == "reshape":
            if not batched:
                out = [prim.bind(*invals, **params)]
            else:
                ns = tuple(params["new_sizes"])
                assert params.get("dimensions") is None
                assert ns and ns[0] == block, ns
                if (np.ndim(invals[0]) == 1
                        and (len(ns) == 1
                             or all(d == 1 for d in ns[1:]))):
                    out = [invals[0]]          # alias identity
                else:
                    # trailing-batch reshape commutes: linear index =
                    # feat_lin * block + env on both sides
                    out = [jax.lax.reshape(
                        _mat(invals[0], eqn.in_avals[0]),
                        ns[1:] + (block,))]
        elif name == "squeeze":
            if not batched:
                out = [prim.bind(*invals, **params)]
            else:
                dims = params["dimensions"]
                assert 0 not in dims
                if np.ndim(invals[0]) == 1:
                    out = [invals[0]]          # alias identity
                else:
                    out = [prim.bind(invals[0],
                                     dimensions=tuple(d - 1
                                                      for d in dims))]
        elif name == "slice":
            if not batched:
                out = [prim.bind(*invals, **params)]
            else:
                st, li = params["start_indices"], params["limit_indices"]
                sd = params["strides"] or (1,) * len(st)
                out = [jax.lax.slice(_mat(invals[0], eqn.in_avals[0]),
                                     tuple(st[1:]) + (st[0],),
                                     tuple(li[1:]) + (li[0],),
                                     tuple(sd[1:]) + (sd[0],))]
        elif name == "concatenate":
            if not batched:
                out = [prim.bind(*invals, **params)]
            else:
                d = params["dimension"]
                assert d != 0, "batch axis is never concatenated"
                vals = [_mat(v, av) if b else v
                        for v, b, av in zip(invals, inbat, eqn.in_avals)]
                out = [prim.bind(*vals, dimension=d - 1)]
        elif name == "dot_general":
            ((lc, rc), (lb, rb)) = params["dimension_numbers"]
            assert not lb and not rb, "batched dot_general not in step"
            lhs, rhs = invals
            if inbat[0] and not inbat[1]:
                # orig (b,F)@(F,G) -> rotated (G,b) = Bt(G,F) @ lhs_t(F,b)
                assert lc == (1,) and rc == (0,), params["dimension_numbers"]
                bt = jnp.swapaxes(rhs, 0, 1)
                out = [jax.lax.dot_general(
                    bt, lhs, (((1,), (0,)), ((), ())),
                    precision=params.get("precision"),
                    preferred_element_type=params.get(
                        "preferred_element_type"))]
            elif not batched:
                out = [prim.bind(*invals, **params)]
            else:
                raise NotImplementedError("dot_general form in step jaxpr")
        else:
            if out_bool or any(
                    getattr(v, "dtype", None) == jnp.bool_ for v in invals):
                raise NotImplementedError(
                    f"kernel transform: unhandled bool primitive {name}")
            if batched:
                raise NotImplementedError(
                    f"kernel transform: unhandled batched primitive {name}")
            out = prim.bind(*invals, **params)
            if not prim.multiple_results:
                out = [out]
        ob = batched or (name == "broadcast_in_dim"
                         and len(params["shape"]) > 0
                         and params["shape"][0] == block)
        for v, o in zip(eqn.outvars, out):
            env[v] = (o, ob)
    return [read(r) for r in plan.outrefs]


def _reset_values(feat, *flat):
    """Pure (values -> values) reset body on one env block (see
    _step_values): engine.reset_body vmapped over the block, consuming
    the pregathered add_players positions and ball rows instead of the
    map. The mapgen/finalize stage stays in XLA (its trip loop is
    while-heavy); this kernel covers the other ~half of the reset event
    — ~1.5k tiny ops that cost ~16 ms per 128-wide queue as dispatched
    XLA."""
    n_dyn = len(feat)
    dyn = list(flat[:n_dyn])
    xy = flat[n_dyn]                       # (b, 4, 2) post-gate positions
    req = flat[n_dyn + 1]                  # (b, 4, 19)
    nr = flat[n_dyn + 2]
    end = flat[n_dyn + 3]
    n_players = flat[n_dyn + 4]

    b = xy.shape[0]
    static = (jnp.zeros((b, 1), _i32),              # map_ids (never read)
              jnp.zeros((b, 2), _i32),              # min_xy (never read)
              jnp.ones((b,), bool),                 # map_ok (never read)
              jnp.zeros((b,), bool),                # map_overflow
              n_players,
              jnp.zeros((b,), _i32),                # n_pieces (never read)
              jnp.zeros((b,), _i32),                # difficulty (never read)
              jnp.zeros((b,), _i32))                # max_steps (never read)
    s = E.merge_state(static, tuple(dyn))
    s = jax.vmap(
        lambda s1, xy1, r1, n1, e1: E.reset_body(s1, xy1, (r1, n1, e1)))(
            s, xy, req, nr, end)
    _, dyn_out = E.split_state(s)
    return tuple(dyn_out)


def make_fused_reset(states, block: int = 128, interpret: bool = False):
    """Build a fused Pallas program for the post-mapgen reset body:
    (dyn..., player_xy, ball req/nr/end, n_players) -> dyn'. Callers
    (vec._KernelPrograms._reset_q) run mapgen + finalize + the ball
    pregather in XLA and this kernel for everything else. Same evaluator
    machinery as the step kernel; bit-exact vs jax.vmap(E.reset_body)
    (tests/test_step_kernel.py)."""
    n = int(states.rng.shape[0])
    block = min(block, n)
    assert n % block == 0, (n, block)
    # non-power-of-two blocks break the evaluator's batch detection in
    # obscure ways (observed: a broadcast_in_dim with bd=(1,) at block
    # 12); fail with a actionable message instead
    assert block & (block - 1) == 0, (
        f"kernel block size must be a power of two (got {block}); "
        "pick 8/16/.../1024")
    feat = _feat_template(states)
    n_dyn = len(feat)

    _, dyn = E.split_state(states)
    ex = [jnp.zeros((block,) + x.shape[1:], x.dtype) for x in dyn]
    ex.append(jnp.zeros((block, 4, 2), _i32))       # player_xy
    for _ in range(3):
        ex.append(jnp.zeros((block, 4, E.N_BALL), _i32))  # req/nr/end
    ex.append(jnp.zeros((block,), _i32))            # n_players
    body = functools.partial(_reset_values, feat)
    closed_jaxpr = jax.make_jaxpr(body)(*ex)
    from .jaxpr_opt import build_plan
    plan = build_plan(closed_jaxpr, block)

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
    assert all(block not in u.shape for u in uniq), \
        "hoisted constant has a block-sized axis; pick another block size"

    n_in = len(ex)
    in_meta = ([(len(f) == 0, d == jnp.bool_) for _, f, d in feat]
               + [(False, False)] * 4 + [(True, False)])

    def kernel(*refs):
        ins = refs[:n_in]
        crefs = refs[n_in:n_in + len(uniq)]
        outs = refs[n_in + len(uniq):]
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
                   _eval_kernel(plan, block, inline_consts, hoisted,
                                *vals)]
        for r, v, (scal, is_bool) in zip(outs, results, in_meta[:n_dyn]):
            if v.dtype == jnp.bool_:
                v = v.astype(_i32)
            if scal:
                v = v[None]
            r[...] = v

    def bspec(shape):
        bs = (None,) + tuple(int(d) for d in shape[1:])
        return pl.BlockSpec(bs, lambda i: (i,) + (0,) * (len(bs) - 1),
                            memory_space=pltpu.VMEM)

    def cspec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    nb = n // block

    def _tshape(x):
        f = tuple(int(d) for d in x.shape[1:])
        return (nb,) + (f if f else (1,)) + (block,)

    def t_in(x):
        if x.ndim == 1:
            return x.reshape(nb, 1, block)
        x = x.reshape((nb, block) + x.shape[1:])
        return jnp.moveaxis(x, 1, -1)

    def t_out(o, fshape):
        if len(fshape) == 0:
            return o.reshape(n)
        o = jnp.moveaxis(o, -1, 1)
        return o.reshape((n,) + tuple(fshape))

    out_shapes_full = [jax.ShapeDtypeStruct(
        _tshape(x), _i32 if x.dtype == jnp.bool_ else x.dtype)
        for x in dyn]

    def fused_reset(dyn_leaves, player_xy, ball, n_players):
        """Env-major (n, f...) in/out; bools handled internally."""
        ins = [t_in(x.astype(_i32) if x.dtype == jnp.bool_ else x)
               for x in dyn_leaves]
        ins.append(t_in(player_xy))
        for part in ball:
            ins.append(t_in(jnp.asarray(part, _i32)))
        ins.append(t_in(n_players))
        outs = pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=([bspec(x.shape) for x in ins]
                      + [cspec(u.shape) for u in uniq2d]),
            out_specs=[bspec(sh.shape) for sh in out_shapes_full],
            out_shape=out_shapes_full,
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
        )(*ins, *uniq2d)
        new_dyn = []
        for o, (_, fshape, fdtype) in zip(outs, feat):
            o = t_out(o, fshape)
            if fdtype == jnp.bool_:
                o = o != 0
            new_dyn.append(o)
        return tuple(new_dyn)

    return fused_reset


def make_fused_step(states, mask_src: str = "storage", block: int = 256,
                    interpret: bool = False, debug: bool = False,
                    gate_dead: bool = False, null_body: bool = False):
    """Build a (states, srngs) -> (states, srngs, actions) fused step for
    this batch shape. ``block`` envs per kernel instance (grid over
    N/block). ``gate_dead`` freezes done envs' sampler streams
    (engine.fused_sample_step). ``null_body`` replaces the step logic with
    input->output copies (identical I/O shape): the launch+DMA floor,
    used by tools/tpu_true_step_cost.py to split compute from I/O."""
    n = int(states.rng.shape[0])
    block = min(block, n)
    assert n % block == 0, (n, block)
    # non-power-of-two blocks break the evaluator's batch detection in
    # obscure ways (observed: a broadcast_in_dim with bd=(1,) at block
    # 12); fail with a actionable message instead
    assert block & (block - 1) == 0, (
        f"kernel block size must be a power of two (got {block}); "
        "pick 8/16/.../1024")
    feat = _feat_template(states)
    n_dyn = len(feat)

    # ---- trace once on a block to extract the hoisted constants ----------
    # (env-major, exactly like the XLA path; the kernel evaluator rotates)
    _, dyn = E.split_state(states)
    ex = [jnp.zeros((block,) + x.shape[1:], x.dtype) for x in dyn]
    ex.append(jnp.zeros((block,), jnp.int32))
    for _ in range(4):
        ex.append(jnp.zeros((block,), _i32))    # packed ball words
    ex.append(jnp.zeros((block,), _i32))
    ex.append(jnp.zeros((block,), _i32))
    body = functools.partial(_step_values, feat, mask_src, gate_dead)
    # make_jaxpr exposes *every* captured constant (closure_convert lifts
    # only inexact dtypes); build_plan then flattens + folds + CSEs + DCEs
    # the trace, and the kernel re-evaluates the plan with the surviving
    # array constants bound to replicated kernel inputs.
    closed_jaxpr = jax.make_jaxpr(body)(*ex)
    from .jaxpr_opt import build_plan
    plan = build_plan(closed_jaxpr, block)

    # ("k", i) refs resolve to either an inlined scalar (Mosaic allows
    # scalar constants) or a replicated VMEM input (arrays; bool -> i32,
    # 1-D ridden as (1, n))
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
    # batch detection in _eval_kernel keys on axis extent == block; no
    # hoisted constant may alias it
    assert all(block not in u.shape for u in uniq), \
        f"hoisted constant has a {block}-sized axis; pick another block size"

    n_in = len(ex)

    in_meta = ([(len(f) == 0, d == jnp.bool_) for _, f, d in feat]
               + [(True, False)] * 7)

    def kernel(*refs):
        ins = refs[:n_in]
        crefs = refs[n_in:n_in + len(uniq)]
        outs = refs[n_in + len(uniq):]
        if null_body:
            # I/O floor probe: copy dyn leaves + srng through, zero actions
            for r, src in zip(outs[:n_dyn + 1], ins[:n_dyn + 1]):
                r[...] = src[...]
            outs[n_dyn + 1][...] = jnp.zeros(
                outs[n_dyn + 1].shape, jnp.int32)
            return
        # boolfree convention: bool leaves stay i32 0/1 through the whole
        # jaxpr evaluation (see _eval_kernel) — no i1 loads/stores at all.
        vals = []
        for r, (scal, is_bool) in zip(ins, in_meta):
            v = r[...]
            if scal:
                v = v[0]             # (1, b) -> (b,): sublane squeeze
            vals.append(v)
        hoisted = {}
        for i, j in hoist_idx.items():
            v = crefs[j][...][0] if uniq[j].ndim < 2 else crefs[j][...]
            hoisted[i] = v
        results = [p[0] for p in
                   _eval_kernel(plan, block, inline_consts, hoisted, *vals)]
        for r, v, (scal, is_bool) in zip(outs, results,
                                         in_meta[:n_dyn] + [(True, False),
                                                            (False, False)]):
            if v.dtype == jnp.bool_:
                v = v.astype(_i32)
            if scal:
                v = v[None]          # (b,) -> (1, b): sublane insert
            r[...] = v

    def bspec(shape):
        """Blocks ride a leading grid axis: buffers are (n_blocks, f...,
        block) so every window starts at lane 0 — windowing the env axis
        itself (lane offsets 256·i) makes Mosaic relayout every load/store
        (~3x per-block cost, measured)."""
        bs = (None,) + tuple(int(d) for d in shape[1:])
        return pl.BlockSpec(bs, lambda i: (i,) + (0,) * (len(bs) - 1),
                            memory_space=pltpu.VMEM)

    def cspec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    nb = n // block

    def _tshape(x):
        # env-major (n, f...) leaf -> blocked env-minor (nb, f..., block);
        # scalar leaves ride one sublane row: (nb, 1, block)
        f = tuple(int(d) for d in x.shape[1:])
        return (nb,) + (f if f else (1,)) + (block,)

    def t_in(x):
        """(n, f...) -> (nb, f..., block): per-block env-minor rotation."""
        if x.ndim == 1:
            return x.reshape(nb, 1, block)
        x = x.reshape((nb, block) + x.shape[1:])
        return jnp.moveaxis(x, 1, -1)

    def t_out(o, fshape):
        """(nb, f..., block) -> (n, f...)."""
        if len(fshape) == 0:
            return o.reshape(n)
        o = jnp.moveaxis(o, -1, 1)
        return o.reshape((n,) + tuple(fshape))

    out_shapes_full = ([jax.ShapeDtypeStruct(
                            _tshape(x),
                            _i32 if x.dtype == jnp.bool_ else x.dtype)
                        for x in dyn]
                       + [jax.ShapeDtypeStruct((nb, 1, block), jnp.int32),
                          jax.ShapeDtypeStruct((nb, 5, block), _i32)])

    def fused_blocked(bdyn, bsrng, bball, bnp, bms):
        """One fused step on BLOCKED env-minor buffers: every operand and
        result is (nb, f..., block) with bools as i32. This is the layout
        the kernel wants; keeping the rollout carry in it avoids the
        per-leaf XLA transposes that otherwise dominate the step (measured
        ~8x the kernel's own cost). ``bball`` is a 4-tuple of packed ball
        words (engine.ball_words layout), each (nb, 1, block) — separate
        inputs so the rollout's flat gathers feed the kernel without an
        XLA-side stack."""
        ins = list(bdyn) + [bsrng] + list(bball) + [bnp, bms]
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
        return tuple(outs[:n_dyn]), outs[n_dyn], outs[n_dyn + 1]

    def fused(states, srngs):
        words = jax.vmap(E.ball_words)(states)          # XLA map gather
        _, dyn = E.split_state(states)
        ins = [t_in(x.astype(_i32) if x.dtype == jnp.bool_ else x)
               for x in dyn]
        bball = tuple(t_in(w) for w in words)
        new_bdyn, bsrng, bact = fused_blocked(
            tuple(ins), t_in(srngs), bball,
            t_in(states.n_players), t_in(states.max_steps))

        new_dyn = []
        for o, (_, fshape, fdtype) in zip(new_bdyn, feat):
            o = t_out(o, fshape)
            if fdtype == jnp.bool_:
                o = o != 0
            new_dyn.append(o)
        new_dyn = tuple(new_dyn)
        static, _ = E.split_state(states)
        new_states = E.merge_state(static, new_dyn)
        return new_states, t_out(bsrng, ()), t_out(bact, (5,))

    fused.blocked = fused_blocked
    fused.t_in = t_in
    fused.t_out = t_out
    fused.feat = feat
    fused.nb = nb
    fused.block = block
    return fused
