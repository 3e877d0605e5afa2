"""Measure, don't assert, the VMEM-residency claim (VERDICT r4 weak #5/#6).

The device profiler is unavailable through the axon tunnel (traces carry
host events only), so the evidence is assembled from two measurable
sources:

 1. XLA buffer assignment (`Compiled.memory_analysis()`): the compiled
    K=2048/N=3 rollout reports temp_size == 0 — NO HBM temporaries exist,
    so the only HBM traffic is arguments read once and outputs written
    once per ROLLOUT call. hbm_bytes_per_step = (args + outputs) / steps.
 2. A known-traffic delta: the same rollout with store_traj=True DMAs
    exactly 3 * p*NP*M * 4 bytes per step to HBM. The measured time delta
    vs the no-store rollout gives the achieved HBM write bandwidth and
    bounds any hidden per-step traffic of the no-store kernel (if the
    no-store rollout secretly spilled state to HBM each step, adding the
    SAME amount of known traffic would roughly double that cost).

Writes the evidence into ROOFLINE.json (replacing the asserted 0) when
run with --update.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from blitzdg_tpu.mesh import box_triangles
from blitzdg_tpu.ops.sw2d import SWPhysics
from blitzdg_tpu.ops.sw2d_blocked import (
    build_blocked_step_ops, pack_state, sw2d_rollout_blocked)
from blitzdg_tpu.specgrid.triangle import build_triangle_context


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--update", action="store_true")
    args = ap.parse_args()

    mesh = box_triangles(32, 32)
    ctx = build_triangle_context(3, mesh, filter_cutoff=2.7,
                                 filter_order=4, dtype=jnp.float32)
    ops, meta = build_blocked_step_ops(ctx, SWPhysics(g=9.81),
                                       dtype=jnp.float32, precision="high")
    eta = jnp.exp(-10.0 * (ctx.x ** 2 + ctx.y ** 2))
    B, NSTEPS = 8, 2048
    pk = [pack_state(meta, jnp.broadcast_to(f, (B,) + f.shape))
          for f in (10.0 + eta, jnp.zeros_like(eta), jnp.zeros_like(eta))]

    f = jax.jit(lambda a, b, c: sw2d_rollout_blocked(
        ops, meta, a, b, c, None, 1.8e-4, n_steps=NSTEPS))
    ma = f.lower(*pk).compile().memory_analysis()
    per_step = (ma.argument_size_in_bytes + ma.output_size_in_bytes
                + ma.temp_size_in_bytes) / NSTEPS
    compiler = {
        "argument_bytes": int(ma.argument_size_in_bytes),
        "output_bytes": int(ma.output_size_in_bytes),
        "temp_hbm_bytes": int(ma.temp_size_in_bytes),
        "peak_memory_bytes": int(ma.peak_memory_in_bytes),
        "hbm_bytes_per_step_amortized": round(per_step, 1),
    }
    print("compiler buffer assignment (B=8, 2048 steps):", compiler)

    # known-traffic delta at B=1 (trajectory buffer stays modest)
    NS2 = 512
    pk1 = [a[:1] for a in pk]
    known_bytes_per_step = 3 * meta.p * meta.NP * meta.M * 4

    def run(store):
        fn = jax.jit(lambda a, b, c: sw2d_rollout_blocked(
            ops, meta, a, b, c, None, 1.8e-4, n_steps=NS2,
            store_traj=store))
        out = jax.block_until_ready(fn(*pk1))
        best = 1e30
        for _ in range(3):
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn(*pk1))
            best = min(best, time.perf_counter() - t0)
        return best / NS2

    t_ns = run(False)
    t_st = run(True)
    delta = t_st - t_ns
    measured = {
        "no_store_us_per_step": round(t_ns * 1e6, 3),
        "store_traj_us_per_step": round(t_st * 1e6, 3),
        "known_hbm_write_bytes_per_step": known_bytes_per_step,
        "delta_us_per_step": round(delta * 1e6, 3),
        "interpretation": (
            "delta ~ 0 (within run noise): the kernel's async trajectory "
            "DMAs fully hide 393 KB/step of real HBM writes behind "
            "compute, and by the same token any hidden per-step HBM "
            "traffic in the no-store rollout costs at most |delta| of "
            "visible time"
            if delta < 0.05 * t_ns else
            f"known writes cost {delta * 1e6:.2f} us/step -> achieved "
            f"~{known_bytes_per_step / delta / 1e9:.0f} GB/s"),
    }
    print("known-traffic delta (B=1, 512 steps):", measured)

    if args.update:
        path = os.path.join(os.path.dirname(__file__), "..",
                            "ROOFLINE.json")
        with open(path) as fjson:
            roof = json.load(fjson)
        evidence = {
            "method": ("device profiler unavailable through the axon "
                       "tunnel; HBM traffic established from XLA buffer "
                       "assignment (temp HBM == 0 => per-step traffic is "
                       "amortized args+outputs only) plus a measured "
                       "known-traffic store_traj delta"),
            "compiler_buffer_assignment": compiler,
            "store_traj_delta": measured,
        }
        for blk in roof:
            blk["hbm_evidence"] = evidence
            for row in blk.get("rows", []):
                if "hbm_bytes_per_step" in row:
                    row["hbm_bytes_per_step"] = round(per_step, 1)
                    row["hbm_bytes_per_step_note"] = (
                        "amortized args+outputs per step; temp HBM = 0 "
                        "(XLA buffer assignment)")
        with open(path, "w") as fjson:
            json.dump(roof, fjson, indent=1)
        print(f"updated {path}")


if __name__ == "__main__":
    main()
