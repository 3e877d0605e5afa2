"""Explicit time integrators as XLA-friendly scans.

Reference analogs: LSERK4 coefficient tables (include/LSERK4.hpp:16-27) and
the SSP-RK2 predictor-corrector loops (src/sw2d-simple/main.cpp:132-151).
Here the stage/step loops are `lax.scan`s over pytree state so a whole
rollout compiles to one fused program (and is differentiable for MPC).
"""
from __future__ import annotations

from typing import Callable, TypeVar

import jax
import jax.numpy as jnp

State = TypeVar("State")

# Carpenter-Kennedy 4th-order 5-stage low-storage RK coefficients
# (same published constants as reference include/LSERK4.hpp:16-27).
LSERK4_A = (
    0.0,
    -567301805773.0 / 1357537059087.0,
    -2404267990393.0 / 2016746695238.0,
    -3550918686646.0 / 2091501179385.0,
    -1275806237668.0 / 842570457699.0,
)
LSERK4_B = (
    1432997174477.0 / 9575080441755.0,
    5161836677717.0 / 13612068292357.0,
    1720146321549.0 / 2090206949498.0,
    3134564353537.0 / 4481467310338.0,
    2277821191437.0 / 14882151754819.0,
)
LSERK4_C = (
    0.0,
    1432997174477.0 / 9575080441755.0,
    2526269341429.0 / 6820363962896.0,
    2006345519317.0 / 3224310063776.0,
    2802321613138.0 / 2924317926251.0,
)


def lserk4_step(rhs: Callable, u: State, t, dt) -> State:
    """One LSERK4 step of du/dt = rhs(u, t) over an arbitrary pytree state.

    The 5-stage loop is unrolled (stage count is tiny and static) so XLA
    fuses each stage's RHS + axpy updates into one kernel.
    """
    res = jax.tree.map(jnp.zeros_like, u)
    for a, b, c in zip(LSERK4_A, LSERK4_B, LSERK4_C):
        k = rhs(u, t + c * dt)
        res = jax.tree.map(lambda r, kk: a * r + dt * kk, res, k)
        u = jax.tree.map(lambda uu, r: uu + b * r, u, res)
    return u


def ssprk2_step(rhs: Callable, u: State, t, dt, post_stage: Callable | None = None) -> State:
    """SSP-RK2 (Heun-type predictor-corrector as in the reference sw2d loops):

        u1 = u + (dt/2) R(u);   u <- u + dt R(u1)

    ``post_stage`` (e.g. a modal filter) is applied to each RHS before use,
    mirroring the Filt@RHS pattern of src/sw2d-simple/main.cpp:133-147.
    """
    def eval_rhs(v, tt):
        k = rhs(v, tt)
        return jax.tree.map(post_stage, k) if post_stage is not None else k

    k1 = eval_rhs(u, t)
    u1 = jax.tree.map(lambda uu, kk: uu + 0.5 * dt * kk, u, k1)
    k2 = eval_rhs(u1, t + 0.5 * dt)
    return jax.tree.map(lambda uu, kk: uu + dt * kk, u, k2)


def integrate(
    step: Callable,
    rhs: Callable,
    u0: State,
    t0,
    dt,
    num_steps: int,
    unroll: int = 1,
) -> State:
    """Fixed-step rollout via `lax.scan` (one compiled program, scannable
    and differentiable — the horizon axis of MPC)."""

    def body(carry, _):
        u, t = carry
        u = step(rhs, u, t, dt)
        return (u, t + dt), None

    (u, _), _ = jax.lax.scan(body, (u0, jnp.asarray(t0, dtype=jnp.result_type(dt))), None,
                             length=num_steps, unroll=unroll)
    return u


def integrate_trajectory(step: Callable, rhs: Callable, u0: State, t0, dt, num_steps: int):
    """Rollout that also stacks the state at every step (for cost terms
    evaluated along a trajectory)."""

    def body(carry, _):
        u, t = carry
        u = step(rhs, u, t, dt)
        return (u, t + dt), u

    (u, _), traj = jax.lax.scan(
        body, (u0, jnp.asarray(t0, dtype=jnp.result_type(dt))), None, length=num_steps
    )
    return u, traj
