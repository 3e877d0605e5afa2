"""Framework-wide numerical configuration.

TPU MXU matmuls default to bfloat16 input passes, which is catastrophic for
spectral DG operators (observed: 200x accuracy loss on the advec1d
benchmark config vs. f32 CPU). All hot operators therefore run their
matmuls under an explicit precision scope, default ``"highest"`` (f32 inputs
via multiple bf16 passes on the MXU). Set ``"default"`` to opt into raw bf16
speed when accuracy tolerances allow, or ``"tensorfloat32"`` for the middle
ground.
"""
from __future__ import annotations

import contextlib

import jax

_MATMUL_PRECISION = "highest"


def set_matmul_precision(p: str) -> None:
    global _MATMUL_PRECISION
    _MATMUL_PRECISION = p


def matmul_precision() -> str:
    return _MATMUL_PRECISION


def precision_scope():
    """Context manager pinning jnp matmul precision for DG operators."""
    if _MATMUL_PRECISION == "default":
        return contextlib.nullcontext()
    return jax.default_matmul_precision(_MATMUL_PRECISION)


def dg_op(fn):
    """Decorator: run a DG operator under the framework matmul-precision
    scope (see module docstring). Applied to every hot RHS/operator."""
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with precision_scope():
            return fn(*args, **kwargs)

    return wrapped
