"""Op-level census of the blocked SSP-RK2 step (VERDICT r4 weak #5).

Traces the EXACT values function the Pallas kernel runs (`_step_values`)
to a jaxpr and buckets every primitive by unit and element count:

  MXU   dot_general passes (the matmuls)
  VPU   elementwise arithmetic (add/mul/div/sqrt/max/select/...)
  MOVE  data movement (concatenate / slice / roll / rev / broadcast)

This is the measured-structure answer to "where does the 40-50% VPU
residual go": divisions+sqrts (multi-cycle VPU), the _plus_trace combo
loop's tiny roll/mask ops (per-op overhead dominated), and the flux
algebra. Run with --json to emit the census dict for ROOFLINE.json.
"""
import argparse
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

from blitzdg_tpu.mesh import box_triangles
from blitzdg_tpu.ops.sw2d import SWPhysics
from blitzdg_tpu.ops.sw2d_blocked import (
    _step_values, build_blocked_step_ops, pack_state)
from blitzdg_tpu.specgrid.triangle import build_triangle_context

VPU_CHEAP = {"add", "sub", "mul", "max", "min", "neg", "select_n", "and",
             "or", "not", "xor", "lt", "le", "gt", "ge", "eq", "ne",
             "abs", "sign", "convert_element_type", "integer_pow"}
VPU_EXPENSIVE = {"div", "sqrt", "rsqrt", "exp", "log", "cos", "sin",
                 "pow", "tanh"}
MOVE = {"concatenate", "slice", "dynamic_slice", "rev", "broadcast_in_dim",
        "reshape", "transpose", "pad", "squeeze", "gather", "roll",
        "tpu_roll", "dynamic_update_slice", "iota"}


def census(n_order, cells, trace_mode="rolls"):
    mesh = box_triangles(cells, cells)
    ctx = build_triangle_context(n_order, mesh,
                                 filter_cutoff=0.9 * n_order,
                                 filter_order=4, dtype=jnp.float32)
    ops, meta = build_blocked_step_ops(ctx, SWPhysics(g=9.81),
                                       dtype=jnp.float32, precision="high",
                                       trace_mode=trace_mode)
    eta = jnp.exp(-10.0 * (ctx.x ** 2 + ctx.y ** 2))
    pk = [pack_state(meta, f[None])[0]
          for f in (10.0 + eta, jnp.zeros_like(eta), jnp.zeros_like(eta))]

    def step(h, hu, hv):
        return _step_values(h, hu, hv, 0.0, None, ops, meta, 1e-4, True)

    jaxpr = jax.make_jaxpr(step)(*pk)

    buckets = defaultdict(lambda: [0, 0])  # name -> [count, elems]
    unit_elems = defaultdict(int)
    unit_ops = defaultdict(int)

    def walk(jx):
        for eqn in jx.eqns:
            for v in eqn.params.values():
                if hasattr(v, "jaxpr"):
                    walk(v.jaxpr)
                elif isinstance(v, (list, tuple)):
                    for vv in v:
                        if hasattr(vv, "jaxpr"):
                            walk(vv.jaxpr)
            name = eqn.primitive.name
            out = eqn.outvars[0].aval
            elems = int(np.prod(out.shape)) if out.shape else 1
            buckets[name][0] += 1
            buckets[name][1] += elems
            if name == "dot_general":
                unit = "MXU"
            elif name in VPU_EXPENSIVE:
                unit = "VPU_expensive"
            elif name in VPU_CHEAP:
                unit = "VPU"
            elif name in MOVE:
                unit = "MOVE"
            else:
                unit = "other"
            unit_ops[unit] += 1
            unit_elems[unit] += elems

    walk(jaxpr.jaxpr)
    return meta, dict(buckets), dict(unit_ops), dict(unit_elems)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()
    out = {}
    for n_order, cells in ((3, 32), (6, 32)):
        for mode in ("rolls", "rolls_v2"):
            meta, buckets, unit_ops, unit_elems = census(
                n_order, cells, mode)
            top = sorted(buckets.items(), key=lambda kv: -kv[1][1])[:14]
            entry = {
                "n_order": n_order, "K": meta.k_elem,
                "trace_mode": mode,
                "layout": {"p": meta.p, "NP": meta.NP, "NT": meta.NT,
                           "M": meta.M},
                "n_trace_combos": len(meta.combos),
                "ops_by_unit": unit_ops,
                "elems_by_unit": unit_elems,
                "top_primitives": [
                    {"prim": k, "count": v[0], "elems": v[1]}
                    for k, v in top],
            }
            out[f"N{n_order}_{mode}"] = entry
            if not args.json:
                print(f"\n=== N={n_order} K={meta.k_elem} {mode} "
                      f"combos={len(meta.combos)} layout p={meta.p} "
                      f"NP={meta.NP} NT={meta.NT} M={meta.M} ===")
                print("unit ops/elems:", {k: (unit_ops[k], unit_elems[k])
                                          for k in unit_ops})
                for k, v in top:
                    print(f"  {k:24s} x{v[0]:4d}  {v[1]:>10d} elems")
    if args.json:
        print(json.dumps(out))


if __name__ == "__main__":
    main()
