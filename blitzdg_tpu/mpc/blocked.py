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
    """Batched Adam shooting solve on the blocked fused rollout.

    The solution reports per-scenario cost plus `grad_norm`, the final
    TRUE gradient norm per scenario (one extra value_and_grad) — the
    convergence-quality metric the solves/s headline is conditioned on
    (VERDICT r4 weak #4)."""
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
    (_, final_costs), gfin = jax.value_and_grad(total, has_aux=True)(c0)
    grad_norm = jnp.sqrt(jnp.sum(gfin * gfin, axis=(-2, -1)))  # (B,)
    return MPCSolution(controls=c0, cost=final_costs,
                       cost_history=history, grad_norm=grad_norm)


def _residuals_blocked(prob, bm, states0, targets, H_rest):
    """Per-scenario stacked LSQ residuals R(c) (B, n_res) with
    sum(R**2, axis=1) == mpc_cost_blocked — the blocked analog of
    solver._mpc_residuals."""
    meta, spc = bm.meta, prob.steps_per_control
    hp = pack_state(meta, states0.h)
    hup = pack_state(meta, states0.hu)
    hvp = pack_state(meta, states0.hv)
    tp = pack_state(meta, targets)
    # wj carries ~1e-17 negative roundoff on some meshes —
    # harmless when squared (the cost path) but NaN under sqrt
    swj = jnp.sqrt(jnp.maximum(bm.wj, 0.0))
    valid = (bm.wj > 0)

    def R(c):
        th, _, _ = bm.rollout(hp, hup, hvp, c)
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


def _gn_lm_fd(R, c0, *, gn_iters, cg_iters, lm_lambda0, fd_eps):
    """Batched Gauss-Newton/LM with forward-difference Jv and exact
    (custom-VJP) Jᵀ: shared by the blocked and curved-blocked MPC solvers.
    R: (B, H, n_ctrl) -> (B, n_res) stacked residuals."""
    bdot = lambda a, b: jnp.sum(a * b, axis=tuple(range(1, a.ndim)))

    def gn_step(carry, _):
        c, lam = carry
        r, pullback = jax.vjp(R, c)
        cost = bdot(r, r)  # (B,)
        g = pullback(r)[0]  # (B, H, n_ctrl)

        def jv_fd(v):
            vn = jnp.sqrt(bdot(v, v))[:, None, None]
            cn = jnp.sqrt(bdot(c, c))[:, None, None]
            eps = fd_eps * (cn + 1.0) / jnp.where(vn > 0, vn, 1.0)
            return (R(c + eps * v) - r) / eps[:, :, 0]

        gn2 = bdot(g, g)
        Jg = jv_fd(g)
        curv = bdot(Jg, Jg) / jnp.where(gn2 > 0, gn2, 1.0)
        lam_eff = (lam * jnp.where(curv > 0, curv, 1.0))[:, None, None]

        def jtjv(v):
            return pullback(jv_fd(v))[0] + lam_eff * v

        b = -g
        x = jnp.zeros_like(b)
        rr = b
        p = rr
        rs = bdot(rr, rr)

        def cg_body(i, st):
            x, rr, p, rs = st
            Ap = jtjv(p)
            denom = bdot(p, Ap)
            ok = denom > 0
            alpha = jnp.where(ok, rs / jnp.where(ok, denom, 1.0),
                              0.0)[:, None, None]
            x = x + alpha * p
            rr = rr - alpha * Ap
            rs_new = bdot(rr, rr)
            beta = jnp.where(ok, rs_new / jnp.where(rs > 0, rs, 1.0),
                             0.0)[:, None, None]
            p = rr + beta * p
            return (x, rr, p, rs_new)

        delta, *_ = jax.lax.fori_loop(0, cg_iters, cg_body, (x, rr, p, rs))

        r_new = R(c + delta)
        new_cost = bdot(r_new, r_new)
        accept = (new_cost < cost)[:, None, None]
        c = jnp.where(accept, c + delta, c)
        lam = jnp.where(accept[:, 0, 0], lam * 0.4, lam * 4.0)
        return (c, lam), jnp.where(accept[:, 0, 0], new_cost, cost)

    lam0 = jnp.full((c0.shape[0],), lm_lambda0, dtype=c0.dtype)
    (controls, _), history = jax.lax.scan(
        gn_step, (c0, lam0), None, length=gn_iters)
    r_fin, pb_fin = jax.vjp(R, controls)
    gfin = pb_fin(r_fin)[0]
    return MPCSolution(
        controls=controls, cost=bdot(r_fin, r_fin), cost_history=history,
        grad_norm=2.0 * jnp.sqrt(bdot(gfin, gfin)))


def solve_mpc_blocked_gn(
    prob: MPCProblem,
    bm: BlockedMPC,
    states0: SWState,
    targets: jnp.ndarray,
    n_controls: int,
    *,
    gn_iters: int = 3,
    cg_iters: int = 4,
    lm_lambda0: float = 1e-2,
    init_controls: jnp.ndarray | None = None,
    H_rest: float = 10.0,
    fd_eps: float = 1e-3,
) -> MPCSolution:
    """Gauss-Newton/LM on the BLOCKED Pallas rollout, batched over
    scenarios: (JᵀJ + λ·curv·I) δ = -JᵀR by matrix-free CG per scenario.

    Jᵀu rides the in-kernel custom-VJP adjoint exactly; Jv uses a
    FORWARD DIFFERENCE through the rollout (the Pallas rollout defines a
    custom VJP only, so true jvp is unavailable — the documented
    tradeoff; fd_eps is scaled per scenario by ‖c‖/‖v‖, and the LM
    damping absorbs the O(fd_eps) product noise). One CG step costs one
    extra rollout + one adjoint."""
    B = states0.h.shape[0]
    dtype = states0.h.dtype
    if init_controls is None:
        c0 = jnp.zeros((B, prob.horizon, n_controls), dtype=dtype)
    else:
        c0 = init_controls
    R = _residuals_blocked(prob, bm, states0, targets, H_rest)
    return _gn_lm_fd(R, c0, gn_iters=gn_iters, cg_iters=cg_iters,
                     lm_lambda0=lm_lambda0, fd_eps=fd_eps)
