from .precon import (
    block_diagonal_blocks,
    block_jacobi_apply,
    block_jacobi_from_assembled,
    block_jacobi_from_matvec,
    block_jacobi_precon,
    invert_blocks,
    probe_diagonal_blocks,
)
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
    "block_diagonal_blocks",
    "block_jacobi_apply",
    "block_jacobi_from_assembled",
    "block_jacobi_from_matvec",
    "block_jacobi_precon",
    "invert_blocks",
    "probe_diagonal_blocks",
]
