from .krylov import (
    CONV_BREAKDOWN,
    CONV_DIVERGED,
    CONV_INF_OR_NAN,
    CONV_MAXITS,
    CONV_STAGNATION,
    CONV_SUCCESS,
    SolveResult,
    cg,
    gmres,
)

__all__ = [
    "cg",
    "gmres",
    "SolveResult",
    "CONV_SUCCESS",
    "CONV_MAXITS",
    "CONV_BREAKDOWN",
    "CONV_INF_OR_NAN",
    "CONV_DIVERGED",
    "CONV_STAGNATION",
]
