"""Batched shooting MPC over the CURVED weak-form dynamics via the fused
blocked Pallas kernel (ops/sw2d_curved_blocked.py) — the fused twin of the
bench's XLA curved-MPC path (BASELINE stretch config: batched MPC over
curved dynamics, reference driver sw2d_curved.py).

Same optimization problem as mpc/blocked.py but with the 4-field tracer
state and per-element (possibly curved) mass inverses in-kernel; the
adjoint is the jax.vjp-in-kernel backward rollout.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.sw2d_curved import SWStateTracer
from ..ops.sw2d_curved_blocked import (
    CurvedBlockedMeta,
    build_curved_blocked_ops,
    make_curved_rollout_blocked,
    pack_curved,
)
from .problem import MPCProblem
from .solver import MPCSolution


class CurvedBlockedMPC(NamedTuple):
    rollout: callable
    meta: CurvedBlockedMeta
    wj: jnp.ndarray  # (p, NP, M) mass-weighted quadrature (0 on padding)


def build_curved_blocked_mpc(
    prob: MPCProblem,
    cub,
    gauss,
    forcing_bu: np.ndarray,
    forcing_bv: np.ndarray,
    interpret: bool = False,
    precision: str = "highest",
) -> CurvedBlockedMPC:
    ctx = prob.ctx
    ops, meta = build_curved_blocked_ops(
        ctx, cub, gauss, prob.phys, forcing_bu=forcing_bu,
        forcing_bv=forcing_bv, dtype=jnp.float32, precision=precision,
        use_filter=prob.use_filter)
    rollout = make_curved_rollout_blocked(
        ops, meta, prob.dt, prob.steps_per_control,
        use_filter=prob.use_filter, interpret=interpret)
    M = ctx.Vinv.T @ ctx.Vinv
    w = M @ jnp.ones((ctx.n_p,), dtype=ctx.J.dtype)
    wj = pack_curved(meta, (w[None, :] * ctx.J)[None])[0].astype(
        jnp.float32)
    return CurvedBlockedMPC(rollout=rollout, meta=meta, wj=wj)


def mpc_cost_curved_blocked(
    prob: MPCProblem,
    bm: CurvedBlockedMPC,
    states0: SWStateTracer,  # (B, K, Np) fields
    controls: jnp.ndarray,   # (B, horizon, n_ctrl)
    targets: jnp.ndarray,    # (B, K, Np) target eta
    H_rest: float = 1.0,
) -> jnp.ndarray:
    meta, spc = bm.meta, prob.steps_per_control
    pk = [pack_curved(meta, f) for f in states0]
    tp = pack_curved(meta, targets)
    th, *_ = bm.rollout(*pk, controls)
    sel = th[:, jnp.arange(1, prob.horizon + 1) * spc]
    err = (sel - H_rest) * (bm.wj[None, None] > 0) - tp[:, None]
    per_step = jnp.sum(bm.wj[None, None] * err * err, axis=(-3, -2, -1))
    running = jnp.sum(per_step, axis=-1) / prob.horizon
    terminal = per_step[:, -1]
    effort = jnp.sum(controls * controls, axis=(-2, -1))
    return (prob.q_eta * running + prob.q_terminal * terminal
            + prob.r_control * effort)


def _residuals_curved_blocked(prob, bm, states0, targets, H_rest):
    """Per-scenario stacked LSQ residuals with sum(R**2, axis=1) ==
    mpc_cost_curved_blocked (the 4-field curved analog of
    blocked._residuals_blocked)."""
    meta, spc = bm.meta, prob.steps_per_control
    pk = [pack_curved(meta, f) for f in states0]
    tp = pack_curved(meta, targets)
    # wj carries ~1e-17 negative roundoff on some meshes —
    # harmless when squared (the cost path) but NaN under sqrt
    swj = jnp.sqrt(jnp.maximum(bm.wj, 0.0))
    valid = (bm.wj > 0)

    def R(c):
        th, *_ = bm.rollout(*pk, c)
        sel = th[:, jnp.arange(1, prob.horizon + 1) * spc]
        err = (sel - H_rest) * valid[None, None] - tp[:, None]
        B = c.shape[0]
        run = (jnp.sqrt(prob.q_eta / prob.horizon)
               * swj[None, None] * err).reshape(B, -1)
        term = (jnp.sqrt(prob.q_terminal)
                * swj[None] * err[:, -1]).reshape(B, -1)
        eff = (jnp.sqrt(prob.r_control) * c).reshape(B, -1)
        return jnp.concatenate([run, term, eff], axis=1)

    return R


def solve_mpc_curved_blocked_gn(
    prob: MPCProblem,
    bm: CurvedBlockedMPC,
    states0: SWStateTracer,
    targets: jnp.ndarray,
    n_controls: int,
    *,
    gn_iters: int = 3,
    cg_iters: int = 4,
    lm_lambda0: float = 1e-2,
    init_controls: jnp.ndarray | None = None,
    H_rest: float = 1.0,
    fd_eps: float = 1e-3,
) -> MPCSolution:
    """Gauss-Newton/LM on the fused CURVED rollout (FD-Jv + exact
    in-kernel adjoint Jᵀ — blocked.solve_mpc_blocked_gn's loop on the
    4-field curved dynamics)."""
    from .blocked import _gn_lm_fd

    B = states0.h.shape[0]
    dtype = states0.h.dtype
    c0 = (jnp.zeros((B, prob.horizon, n_controls), dtype=dtype)
          if init_controls is None else init_controls)
    R = _residuals_curved_blocked(prob, bm, states0, targets, H_rest)
    return _gn_lm_fd(R, c0, gn_iters=gn_iters, cg_iters=cg_iters,
                     lm_lambda0=lm_lambda0, fd_eps=fd_eps)


def solve_mpc_curved_blocked(
    prob: MPCProblem,
    bm: CurvedBlockedMPC,
    states0: SWStateTracer,
    targets: jnp.ndarray,
    n_controls: int,
    *,
    iters: int = 50,
    learning_rate: float = 0.1,
    init_controls: jnp.ndarray | None = None,
    H_rest: float = 1.0,
) -> MPCSolution:
    """Batched Adam shooting solve on the curved blocked rollout."""
    B = states0.h.shape[0]
    dtype = states0.h.dtype
    c0 = (jnp.zeros((B, prob.horizon, n_controls), dtype=dtype)
          if init_controls is None else init_controls)

    def total(c):
        costs = mpc_cost_curved_blocked(prob, bm, states0, c, targets,
                                        H_rest)
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
    (_, final_costs), gfin = jax.value_and_grad(total, has_aux=True)(c0)
    grad_norm = jnp.sqrt(jnp.sum(gfin * gfin, axis=(-2, -1)))
    return MPCSolution(controls=c0, cost=final_costs,
                       cost_history=history, grad_norm=grad_norm)
