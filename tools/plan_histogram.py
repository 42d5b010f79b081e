#!/usr/bin/env python3
"""Histogram the fused step-kernel plan's nodes by primitive and shape.

The round-3 measurement showed the kernel is instruction-issue-bound
(~3.1k Mosaic nodes); this probe shows exactly where the nodes are so
node-count work targets the real mass. Run on any backend:

    JAX_PLATFORMS=cpu python tools/plan_histogram.py [--block 512]
"""
import argparse
import collections
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--block", type=int, default=512)
    ap.add_argument("--mask-src", default="storage")
    ap.add_argument("--gate-dead", action="store_true")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    import functools
    import numpy as np
    import jax
    import jax.numpy as jnp
    from eldorado_tpu import vec
    from eldorado_tpu.core import engine as E
    from eldorado_tpu.ops import step_kernel as K
    from eldorado_tpu.ops.jaxpr_opt import build_plan

    block = args.block
    # only shapes/dtypes matter for plan building: tile a template state
    tmpl = E.make_state(0)
    states = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (block,) + x.shape), tmpl)
    feat = K._feat_template(states)
    _, dyn = E.split_state(states)
    ex = [jnp.zeros((block,) + x.shape[1:], x.dtype) for x in dyn]
    ex.append(jnp.zeros((block,), jnp.int32))
    for _ in range(6):
        ex.append(jnp.zeros((block,), jnp.int32))
    body = functools.partial(K._step_values, feat, args.mask_src,
                             args.gate_dead)
    closed = jax.make_jaxpr(body)(*ex)
    plan = build_plan(closed, block)

    def shape_cls(node):
        out = node.outvars[0].aval
        s = tuple(out.shape)
        # drop the batch axis for the class label
        if s and s[0] == block:
            s = s[1:]
        return s

    by_prim = collections.Counter()
    by_prim_shape = collections.Counter()
    vreg_units = collections.Counter()
    for n in plan.nodes:
        sc = shape_cls(n)
        by_prim[n.prim.name] += 1
        by_prim_shape[(n.prim.name, sc)] += 1
        # vreg proxy: elements per env (feature volume); scalars count 1
        featvol = int(np.prod(sc)) if sc else 1
        vreg_units[(n.prim.name, sc)] += featvol

    total = len(plan.nodes)
    print(f"total nodes: {total}   consts: {len(plan.pool)}")
    print("\n== by primitive ==")
    for name, c in by_prim.most_common():
        print(f"{c:5d}  {name}")
    print(f"\n== top {args.top} (prim, feature-shape) by node count ==")
    for (name, sc), c in by_prim_shape.most_common(args.top):
        print(f"{c:5d}  {name:28s} {sc}")
    print(f"\n== top {args.top} (prim, feature-shape) by vreg units ==")
    for (name, sc), u in vreg_units.most_common(args.top):
        print(f"{u:7d}  {name:28s} {sc}  x{by_prim_shape[(name, sc)]}")
    # scalar-op share
    scal = sum(c for (name, sc), c in by_prim_shape.items() if sc == ())
    print(f"\nscalar-per-env nodes (feature shape ()): {scal} "
          f"({100.0 * scal / total:.1f}%)")


if __name__ == "__main__":
    main()
