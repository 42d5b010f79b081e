"""Build-time jaxpr optimisation for the fused step kernel.

Mosaic executes each primitive of the traced step as a separate vector op —
there is no XLA fusion/CSE inside a Pallas kernel — so the jaxpr itself must
be lean. This module flattens the step jaxpr (inlining pjit/call prims) into
a plain node list and runs three classic passes over it:

* **constant folding**: subgraphs reachable only from trace-time constants
  are evaluated once on the host at build time; their results join the
  hoisted-constant pool (the reference's static tables are closed over by
  the engine, so the raw trace recomputes table transposes/broadcasts per
  kernel invocation — ~hundreds of ops).
* **CSE**: structurally identical nodes (same prim, operands, params) are
  deduplicated (~20% of the step trace: per-player loops re-emit identical
  one-hot/broadcast chains).
* **DCE**: nodes whose results never reach an output are dropped.

The passes are value-level only — no game logic is touched; bit-exactness
is re-validated against the XLA path by tests/test_step_kernel.py.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_CALL_PRIMS = frozenset({"pjit", "closed_call", "core_call", "jit"})

# folding must never materialise a constant big enough to hurt VMEM (the
# pool is replicated into every kernel instance)
_FOLD_MAX_ELEMS = 1 << 16


class Var:
    """Flat-IR value with the original trace aval."""
    __slots__ = ("aval",)

    def __init__(self, aval):
        self.aval = aval


class Node:
    __slots__ = ("prim", "params", "inrefs", "in_avals", "outvars")

    def __init__(self, prim, params, inrefs, in_avals, outvars):
        self.prim = prim
        self.params = params
        self.inrefs = inrefs      # list of ("v", Var) | ("k", int)
        self.in_avals = in_avals  # original avals of the operands
        self.outvars = outvars    # list of Var


class Plan:
    """Flattened + optimised step program.

    nodes: topologically ordered Node list
    pool: list of np arrays (deduped constants; index = ("k", i) refs)
    invars: list of Var for the jaxpr inputs (positional)
    outrefs: list of ("v", Var) | ("k", int) for the jaxpr outputs
    """
    __slots__ = ("nodes", "pool", "invars", "outrefs")

    def __init__(self, nodes, pool, invars, outrefs):
        self.nodes = nodes
        self.pool = pool
        self.invars = invars
        self.outrefs = outrefs


def _params_key(params):
    out = []
    for k, v in sorted(params.items()):
        try:
            hash(v)
            out.append((k, v))
        except TypeError:
            out.append((k, str(v)))
    return tuple(out)


class _Pool:
    def __init__(self):
        self.vals = []
        self._idx = {}

    def add(self, val):
        a = np.asarray(val)
        key = (a.dtype.str, a.shape, a.tobytes())
        if key not in self._idx:
            self._idx[key] = len(self.vals)
            self.vals.append(a)
        return self._idx[key]


def _flatten(closed_jaxpr, pool):
    """Inline all call prims; literals and trace constants go to the pool."""
    from jax.extend import core as jex_core
    nodes = []

    def ref_of(v, env):
        if isinstance(v, jex_core.Literal):
            return ("k", pool.add(v.val))
        return env[v]

    def walk(jaxpr, consts, env):
        for v, c in zip(jaxpr.constvars, consts):
            env[v] = ("k", pool.add(c))
        for eqn in jaxpr.eqns:
            inrefs = [ref_of(v, env) for v in eqn.invars]
            if eqn.primitive.name in _CALL_PRIMS:
                sub = eqn.params["jaxpr"]
                senv = dict(zip(sub.jaxpr.invars, inrefs))
                outs = walk(sub.jaxpr, sub.consts, senv)
                for ov, o in zip(eqn.outvars, outs):
                    env[ov] = o
                continue
            outvars = [Var(ov.aval) for ov in eqn.outvars]
            nodes.append(Node(eqn.primitive, eqn.params, inrefs,
                              [iv.aval for iv in eqn.invars], outvars))
            for ov, nv in zip(eqn.outvars, outvars):
                env[ov] = ("v", nv)
        return [ref_of(v, env) for v in jaxpr.outvars]

    invars = [Var(v.aval) for v in closed_jaxpr.jaxpr.invars]
    env = {v: ("v", nv)
           for v, nv in zip(closed_jaxpr.jaxpr.invars, invars)}
    outrefs = walk(closed_jaxpr.jaxpr, closed_jaxpr.consts, env)
    return nodes, invars, outrefs


def _shr_np(x, n):
    u = x.astype(np.uint32) if x.dtype == np.int32 else x
    return (u >> n.astype(u.dtype)).astype(x.dtype)


# numpy evaluators for the common fold prims: the eager-JAX fallback
# dispatches (and often compiles) a tiny program PER FOLD, which cost
# ~35 s of every plan build (measured: 527 binds, 42 fresh compiles).
# These are exact for int/bool; float elementwise is IEEE-identical;
# float REDUCTIONS stay on the fallback (summation order).
_NP_EVAL = {
    "add": lambda a, b, p: a + b,
    "sub": lambda a, b, p: a - b,
    "mul": lambda a, b, p: a * b,
    "max": lambda a, b, p: np.maximum(a, b),
    "min": lambda a, b, p: np.minimum(a, b),
    "and": lambda a, b, p: a & b,
    "or": lambda a, b, p: a | b,
    "xor": lambda a, b, p: a ^ b,
    "not": lambda a, p: ~a,
    "neg": lambda a, p: -a,
    "shift_left": lambda a, b, p: a << b,
    "shift_right_logical": lambda a, b, p: _shr_np(a, b),
    "shift_right_arithmetic": lambda a, b, p: a >> b,
    "eq": lambda a, b, p: a == b,
    "ne": lambda a, b, p: a != b,
    "lt": lambda a, b, p: a < b,
    "le": lambda a, b, p: a <= b,
    "gt": lambda a, b, p: a > b,
    "ge": lambda a, b, p: a >= b,
}


def _np_fold(name, vals, params, outvars):
    """Evaluate one all-constant node in numpy; None = use the fallback."""
    try:
        if name in ("add", "sub", "mul", "max", "min", "and", "or",
                    "xor", "shift_left", "shift_right_logical",
                    "shift_right_arithmetic", "eq", "ne", "lt", "le",
                    "gt", "ge"):
            a, b = np.broadcast_arrays(*vals)
            out = _NP_EVAL[name](a, b, params)
            if name.startswith("shift") or name in (
                    "add", "sub", "mul", "max", "min", "and", "or",
                    "xor"):
                out = out.astype(vals[0].dtype)
            return [out]
        if name in ("not", "neg"):
            return [_NP_EVAL[name](vals[0], params)]
        if name == "select_n" and len(vals) == 3:
            c, x, y = np.broadcast_arrays(*vals)
            return [np.where(c.astype(bool), y, x).astype(vals[1].dtype)]
        if name == "broadcast_in_dim":
            shape = tuple(params["shape"])
            bd = params["broadcast_dimensions"]
            src = vals[0]
            view_shape = [1] * len(shape)
            for i, d in enumerate(bd):
                view_shape[d] = src.shape[i]
            return [np.broadcast_to(src.reshape(view_shape), shape).copy()]
        if name == "reshape" and params.get("dimensions") is None:
            return [vals[0].reshape(tuple(params["new_sizes"])).copy()]
        if name == "squeeze":
            return [np.squeeze(vals[0], axis=tuple(params["dimensions"]))
                    .copy()]
        if name == "transpose":
            return [np.transpose(vals[0],
                                 tuple(params["permutation"])).copy()]
        if name == "concatenate":
            return [np.concatenate(vals, axis=params["dimension"])]
        if name == "slice":
            st = params["start_indices"]
            li = params["limit_indices"]
            sd = params["strides"] or (1,) * len(st)
            sl = tuple(slice(a, b, c) for a, b, c in zip(st, li, sd))
            return [vals[0][sl].copy()]
        if name == "convert_element_type":
            return [vals[0].astype(params["new_dtype"])]
        if name == "iota":
            dt = params["dtype"]
            shape = tuple(params["shape"])
            d = params["dimension"]
            ar = np.arange(shape[d], dtype=dt)
            view = [1] * len(shape)
            view[d] = shape[d]
            return [np.broadcast_to(ar.reshape(view), shape).copy()]
        if name in ("reduce_sum", "reduce_max", "reduce_min",
                    "reduce_and", "reduce_or", "reduce_prod"):
            v = vals[0]
            if v.dtype in (np.float32, np.float64):
                return None          # summation order: use the fallback
            axes = tuple(params["axes"])
            f = {"reduce_sum": np.sum, "reduce_max": np.max,
                 "reduce_min": np.min, "reduce_prod": np.prod,
                 "reduce_and": np.bitwise_and.reduce,
                 "reduce_or": np.bitwise_or.reduce}[name]
            if name in ("reduce_and", "reduce_or"):
                out = v
                for ax in sorted(axes, reverse=True):
                    out = f(out, axis=ax)
            else:
                out = f(v, axis=axes)
            out = np.asarray(out)
            if name == "reduce_sum" and out.dtype != v.dtype:
                out = out.astype(v.dtype)
            return [out]
    except Exception:
        return None
    return None


def _fold(nodes, pool, block):
    """Evaluate all-constant nodes eagerly on the host."""
    kept = []
    repl = {}  # Var -> ("k", idx)

    def res(ref):
        return repl.get(ref[1], ref) if ref[0] == "v" else ref

    for node in nodes:
        inrefs = [res(r) for r in node.inrefs]
        node.inrefs = inrefs
        total = sum(int(np.prod(ov.aval.shape)) for ov in node.outvars)
        foldable = (all(r[0] == "k" for r in inrefs)
                    and total <= _FOLD_MAX_ELEMS
                    and not any(block in ov.aval.shape
                                for ov in node.outvars))
        if foldable:
            vals = [pool.vals[r[1]] for r in inrefs]
            out = _np_fold(node.prim.name, vals, node.params,
                           node.outvars)
            if out is not None and all(
                    tuple(np.shape(o)) == tuple(ov.aval.shape)
                    and np.asarray(o).dtype == ov.aval.dtype
                    for o, ov in zip(out, node.outvars)):
                for ov, o in zip(node.outvars, out):
                    repl[ov] = ("k", pool.add(np.asarray(o)))
                continue
            try:
                # ensure_compile_time_eval: plan builds can run INSIDE an
                # outer jit trace (the lazily-built reset kernel), where
                # a bare eager bind would return tracers — np.asarray
                # then throws and every fallback fold silently fails,
                # leaving kernel-unlowerable nodes (e.g. scatter)
                # symbolic
                with jax.ensure_compile_time_eval():
                    out = node.prim.bind(*[jnp.asarray(v) for v in vals],
                                         **node.params)
                    if not node.prim.multiple_results:
                        out = [out]
                    out = [np.asarray(o) for o in out]
                for ov, o in zip(node.outvars, out):
                    repl[ov] = ("k", pool.add(o))
                continue
            except Exception:
                pass  # unfoldable prim: keep symbolic
        kept.append(node)
    return kept, repl


def _cse(nodes):
    """Structural dedup: same prim + operand identities + params."""
    kept = []
    seen = {}
    repl = {}

    def res(ref):
        return repl.get(ref[1], ref) if ref[0] == "v" else ref

    for node in nodes:
        node.inrefs = [res(r) for r in node.inrefs]
        ids = tuple(r[1] if r[0] == "k" else id(r[1]) for r in node.inrefs)
        tags = tuple(r[0] for r in node.inrefs)
        key = (node.prim.name, tags, ids, _params_key(node.params))
        prev = seen.get(key)
        if prev is not None:
            for ov, pv in zip(node.outvars, prev.outvars):
                repl[ov] = ("v", pv)
            continue
        seen[key] = node
        kept.append(node)
    return kept, repl


def _identities(nodes, pool):
    """Local algebraic rewrites that drop whole nodes.

    The branchless step evaluates every dispatch branch and merges ~25
    state leaves with ``_select`` — for leaves a branch does not touch both
    select operands are the SAME value, so the select is an identity. The
    same shape of waste appears as ``and/or/add/sub/mul`` against neutral
    constants (mask composition with all-ones/zero heads). None of this is
    visible to CSE (the nodes are unique); each rewrite here removes a
    full-width vector op from the kernel body.

    Rules (applied only when the output aval equals the surviving operand's
    aval, so broadcasting semantics never change):
      select_n(p, x, x)            -> x
      and(x, ones) / or(x, zeros)  -> x        (+ mirrored)
      and(x, zeros)                -> zeros    (+ mirrored)
      or(x, ones)                  -> ones     (+ mirrored)
      add/sub/xor (x, 0)           -> x        (add/xor mirrored)
      mul(x, 1) / mul(x, 0)        -> x / 0    (+ mirrored)
      select_n(const p, x, y)      -> x|y
    """
    kept = []
    repl = {}

    def res(ref):
        return repl.get(ref[1], ref) if ref[0] == "v" else ref

    def aval_of(ref):
        if ref[0] == "k":
            a = pool.vals[ref[1]]
            return a.shape, a.dtype
        return tuple(ref[1].aval.shape), ref[1].aval.dtype

    def const_of(ref):
        return pool.vals[ref[1]] if ref[0] == "k" else None

    def neutral(c, kind):
        if c is None:
            return False
        if kind == "ones":
            if c.dtype == np.bool_:
                return bool(np.all(c))
            return bool(np.all(c == ~np.zeros((), c.dtype)))
        return bool(np.all(c == 0)) if kind == "zeros" else False

    for node in nodes:
        node.inrefs = [res(r) for r in node.inrefs]
        name = node.prim.name
        out = None  # ref to forward the (single) output to
        if len(node.outvars) == 1:
            oav = (tuple(node.outvars[0].aval.shape),
                   node.outvars[0].aval.dtype)
            irs = node.inrefs

            def same(i):
                return aval_of(irs[i]) == oav

            if name == "select_n" and len(irs) == 3:
                if irs[1] == irs[2] and same(1):
                    out = irs[1]
                else:
                    p = const_of(irs[0])
                    if p is not None and p.ndim == 0:
                        pick = irs[1 + int(p)]
                        if aval_of(pick) == oav:
                            out = pick
            elif name in ("and", "or", "add", "sub", "mul", "xor"):
                c0, c1 = const_of(irs[0]), const_of(irs[1])
                if name == "and":
                    if neutral(c1, "ones") and same(0):
                        out = irs[0]
                    elif neutral(c0, "ones") and same(1):
                        out = irs[1]
                    elif neutral(c1, "zeros") and same(1):
                        out = irs[1]
                    elif neutral(c0, "zeros") and same(0):
                        out = irs[0]
                elif name == "or":
                    if neutral(c1, "zeros") and same(0):
                        out = irs[0]
                    elif neutral(c0, "zeros") and same(1):
                        out = irs[1]
                elif name in ("add", "xor"):
                    if neutral(c1, "zeros") and same(0):
                        out = irs[0]
                    elif neutral(c0, "zeros") and same(1):
                        out = irs[1]
                elif name == "sub":
                    if neutral(c1, "zeros") and same(0):
                        out = irs[0]
                elif name == "mul":
                    if neutral(c1, "ones") and same(0):
                        out = irs[0]
                    elif neutral(c0, "ones") and same(1):
                        out = irs[1]
                    elif neutral(c1, "zeros") and same(1):
                        out = irs[1]
                    elif neutral(c0, "zeros") and same(0):
                        out = irs[0]
        if out is not None:
            repl[node.outvars[0]] = out
            continue
        kept.append(node)
    return kept, repl


def _dce(nodes, outrefs):
    live = {r[1] for r in outrefs if r[0] == "v"}
    kept = []
    for node in reversed(nodes):
        if any(ov in live for ov in node.outvars):
            kept.append(node)
            live.update(r[1] for r in node.inrefs if r[0] == "v")
    kept.reverse()
    return kept


def build_plan(closed_jaxpr, block) -> Plan:
    """flatten -> fold -> CSE -> DCE; also prunes the pool to used consts."""
    pool = _Pool()
    nodes, invars, outrefs = _flatten(closed_jaxpr, pool)
    n0 = len(nodes)
    # fold/CSE/identity rewrites enable one another (an identity fold can
    # make two nodes structurally equal; CSE can make a select's branches
    # identical) — iterate to fixpoint
    for _ in range(4):
        before = len(nodes)
        repls = []
        nodes, r = _fold(nodes, pool, block)
        repls.append(r)
        nodes, r = _cse(nodes)
        repls.append(r)
        nodes, r = _identities(nodes, pool)
        repls.append(r)

        def res(ref, repls=repls):
            for rp in repls:
                if ref[0] != "v":
                    return ref
                ref = rp.get(ref[1], ref)
            return ref

        outrefs = [res(r) for r in outrefs]
        nodes = _dce(nodes, outrefs)
        if len(nodes) == before:
            break

    # prune pool to constants still referenced
    used = sorted({r[1] for n in nodes for r in n.inrefs if r[0] == "k"}
                  | {r[1] for r in outrefs if r[0] == "k"})
    remap = {old: new for new, old in enumerate(used)}
    new_pool = [pool.vals[i] for i in used]
    for n in nodes:
        n.inrefs = [("k", remap[r[1]]) if r[0] == "k" else r
                    for r in n.inrefs]
    outrefs = [("k", remap[r[1]]) if r[0] == "k" else r for r in outrefs]

    import logging
    logging.getLogger(__name__).info(
        "step-kernel plan: %d -> %d nodes (%d consts)", n0, len(nodes),
        len(new_pool))
    return Plan(nodes, new_pool, invars, outrefs)
