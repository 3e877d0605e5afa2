"""MPC solvers: fixed-iteration gradient descent (Adam) over control
sequences, batched over scenarios, plus a receding-horizon driver.

Fixed iteration counts keep shapes/trip-counts static so one jitted program
covers the entire solve (compile once, thousands of scenario solves per
call). Gradients flow through the `lax.scan` rollout via reverse-mode AD.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..ops.sw2d import SWState
from .problem import MPCProblem, mpc_cost, rollout_controls


class MPCSolution(NamedTuple):
    controls: jnp.ndarray  # (horizon, n_controls)
    cost: jnp.ndarray
    cost_history: jnp.ndarray  # (iters,)


def solve_mpc(
    prob: MPCProblem,
    state0: SWState,
    target_eta: jnp.ndarray,
    control_to_forcing: Callable,
    n_controls: int,
    *,
    iters: int = 50,
    learning_rate: float = 0.1,
    init_controls: jnp.ndarray | None = None,
    H_rest=10.0,
) -> MPCSolution:
    """Solve one shooting problem with Adam over the control sequence.

    Batch over scenarios with `jax.vmap` over (state0, target_eta
    [, init_controls]).
    """
    dtype = state0.h.dtype
    if init_controls is None:
        init_controls = jnp.zeros((prob.horizon, n_controls), dtype=dtype)

    loss = lambda c: mpc_cost(prob, state0, c, target_eta, control_to_forcing, H_rest)
    opt = optax.adam(learning_rate)

    def step(carry, _):
        c, opt_state = carry
        cost, grad = jax.value_and_grad(loss)(c)
        updates, opt_state = opt.update(grad, opt_state, c)
        c = optax.apply_updates(c, updates)
        return (c, opt_state), cost

    (controls, _), history = jax.lax.scan(
        step, (init_controls, opt.init(init_controls)), None, length=iters
    )
    return MPCSolution(controls=controls, cost=loss(controls), cost_history=history)


def receding_horizon(
    prob: MPCProblem,
    state0: SWState,
    target_eta: jnp.ndarray,
    control_to_forcing: Callable,
    n_controls: int,
    *,
    n_cycles: int,
    iters: int = 30,
    learning_rate: float = 0.1,
    H_rest=10.0,
):
    """Receding-horizon MPC: optimize, apply the first control block, roll
    the plant one control step, re-optimize (warm-started by shifting).

    Returns (final plant state, applied controls (n_cycles, n_controls),
    per-cycle costs).
    """

    def cycle(carry, _):
        state, warm = carry
        sol = solve_mpc(
            prob,
            state,
            target_eta,
            control_to_forcing,
            n_controls,
            iters=iters,
            learning_rate=learning_rate,
            init_controls=warm,
            H_rest=H_rest,
        )
        # apply first control block to the plant
        one = sol.controls[:1]
        single = MPCProblem(
            ctx=prob.ctx,
            phys=prob.phys,
            dt=prob.dt,
            horizon=1,
            steps_per_control=prob.steps_per_control,
            q_eta=prob.q_eta,
            q_terminal=prob.q_terminal,
            r_control=prob.r_control,
            use_filter=prob.use_filter,
        )
        state, _ = rollout_controls(single, state, one, control_to_forcing)
        # shift warm start
        warm = jnp.concatenate([sol.controls[1:], sol.controls[-1:]], axis=0)
        return (state, warm), (sol.controls[0], sol.cost)

    warm0 = jnp.zeros((prob.horizon, n_controls), dtype=state0.h.dtype)
    (state, _), (applied, costs) = jax.lax.scan(
        cycle, (state0, warm0), None, length=n_cycles
    )
    return state, applied, costs
