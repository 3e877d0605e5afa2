"""Large-mesh Pallas MPC: shooting optimization over the element-BLOCKED
fused rollout (ops/sw2d_blocked.py).

Same optimization problem as mpc_cost/solve_mpc and the dense-kernel
mpc/pallas.py, but the dynamics kernel scales to K in the thousands:
operators stay (Np, Np), states are transposed (NP, Kp) tiles, and the
adjoint is the jax.vjp-in-kernel backward rollout. Use this above the
dense path's K<~200 comfort zone (the dense path stays faster for tiny
meshes with huge scenario batches).

Scope: wall-only BCs, flat bottom, control forcing linear in the controls
— the MPC regime. Scenario batching is native (kernel grid); do NOT vmap.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.sw2d import SWState
from ..ops.sw2d_blocked import (
    BlockedMeta,
    build_blocked_step_ops,
    make_rollout_blocked,
    pack_state,
)
from .problem import MPCProblem
from .solver import MPCSolution


class BlockedMPC(NamedTuple):
    rollout: callable
    meta: BlockedMeta
    wj: jnp.ndarray  # (p, NP, M) mass-weighted quadrature (0 on padding)


def build_blocked_mpc(
    prob: MPCProblem,
    forcing_bu: np.ndarray,  # (n_ctrl, K, Np) linear hu-forcing injector
    forcing_bv: np.ndarray,
    interpret: bool = False,
) -> BlockedMPC:
    ctx = prob.ctx
    ops, meta = build_blocked_step_ops(ctx, prob.phys, forcing_bu, forcing_bv)
    rollout = make_rollout_blocked(
        ops, meta, prob.dt, prob.steps_per_control,
        use_filter=prob.use_filter, interpret=interpret,
    )
    M = ctx.Vinv.T @ ctx.Vinv
    w = M @ jnp.ones((ctx.n_p,), dtype=ctx.J.dtype)
    wj = pack_state(meta, (w[None, :] * ctx.J)[None])[0].astype(jnp.float32)
    return BlockedMPC(rollout=rollout, meta=meta, wj=wj)


def mpc_cost_blocked(
    prob: MPCProblem,
    bm: BlockedMPC,
    states0: SWState,  # (B, K, Np) fields
    controls: jnp.ndarray,  # (B, horizon, n_ctrl)
    targets: jnp.ndarray,  # (B, K, Np) target eta
    H_rest: float = 10.0,
) -> jnp.ndarray:
    """Per-scenario quadratic tracking cost (B,) — blocked analog of
    mpc_cost_pallas, batched natively."""
    meta, spc = bm.meta, prob.steps_per_control
    hp = pack_state(meta, states0.h)
    hup = pack_state(meta, states0.hu)
    hvp = pack_state(meta, states0.hv)
    tp = pack_state(meta, targets)

    th, _, _ = bm.rollout(hp, hup, hvp, controls)
    # states after each control block: step indices (j+1)*spc, j=0..H-1
    sel = th[:, jnp.arange(1, prob.horizon + 1) * spc]  # (B, H, p, NP, M)
    err = (sel - H_rest) * (bm.wj[None, None] > 0) - tp[:, None]
    per_step = jnp.sum(bm.wj[None, None] * err * err,
                       axis=(-3, -2, -1))  # (B, H)
    running = jnp.sum(per_step, axis=-1) / prob.horizon
    terminal = per_step[:, -1]
    effort = jnp.sum(controls * controls, axis=(-2, -1))
    return (prob.q_eta * running + prob.q_terminal * terminal
            + prob.r_control * effort)


def solve_mpc_blocked(
    prob: MPCProblem,
    bm: BlockedMPC,
    states0: SWState,  # (B, K, Np) fields
    targets: jnp.ndarray,  # (B, K, Np)
    n_controls: int,
    *,
    iters: int = 50,
    learning_rate: float = 0.1,
    init_controls: jnp.ndarray | None = None,  # (B, horizon, n_controls)
    H_rest: float = 10.0,
) -> MPCSolution:
    """Batched Adam shooting solve on the blocked fused rollout."""
    B = states0.h.shape[0]
    dtype = states0.h.dtype
    if init_controls is None:
        c0 = jnp.zeros((B, prob.horizon, n_controls), dtype=dtype)
    else:
        c0 = init_controls

    def total(c):
        costs = mpc_cost_blocked(prob, bm, states0, c, targets, H_rest)
        return jnp.sum(costs), costs

    opt = optax.adam(learning_rate)

    def step(carry, _):
        c, opt_state = carry
        (_, costs), grad = jax.value_and_grad(total, has_aux=True)(c)
        updates, opt_state = opt.update(grad, opt_state, c)
        c = optax.apply_updates(c, updates)
        return (c, opt_state), costs

    (c0, _), history = jax.lax.scan(step, (c0, opt.init(c0)), None,
                                    length=iters)
    _, final_costs = total(c0)
    return MPCSolution(controls=c0, cost=final_costs, cost_history=history)
