from .blocked import (
    BlockedMPC,
    build_blocked_mpc,
    mpc_cost_blocked,
    solve_mpc_blocked,
    solve_mpc_blocked_gn,
)
from .curved_blocked import (
    CurvedBlockedMPC,
    build_curved_blocked_mpc,
    mpc_cost_curved_blocked,
    solve_mpc_curved_blocked,
    solve_mpc_curved_blocked_gn,
)
from .pallas import PallasMPC, build_pallas_mpc, mpc_cost_pallas, solve_mpc_pallas
from .problem import MPCProblem, mpc_cost, rollout_controls
from .solver import MPCSolution, receding_horizon, solve_mpc, solve_mpc_gn

__all__ = [
    "MPCProblem",
    "mpc_cost",
    "rollout_controls",
    "MPCSolution",
    "solve_mpc",
    "solve_mpc_gn",
    "receding_horizon",
    "PallasMPC",
    "build_pallas_mpc",
    "mpc_cost_pallas",
    "solve_mpc_pallas",
    "BlockedMPC",
    "build_blocked_mpc",
    "mpc_cost_blocked",
    "solve_mpc_blocked",
    "solve_mpc_blocked_gn",
    "CurvedBlockedMPC",
    "build_curved_blocked_mpc",
    "mpc_cost_curved_blocked",
    "solve_mpc_curved_blocked",
    "solve_mpc_curved_blocked_gn",
]
