"""Precision-controlled MXU dots for Pallas kernels.

TPU MXU passes per f32 dot: 'highest' = 6 (full f32 via 3-way operand
split), 'high' = 3 (bf16_3x), 'default' = 1 (raw bf16 — rounds operands to
8 mantissa bits; unusable for DG states where O(1e-3) perturbations ride on
h ~ 10, see config.dg_op).

Mosaic has no lowering for jax.lax.Precision.HIGH inside pallas_call, so
'high' is built by hand: x = hi + lo with hi = bf16(x),
a@b ~= ah@bh + ah@bl + al@bh (the lo*lo term is below 2^-16 relative and
dropped) — three single-pass bf16 dots instead of HIGHEST's six. Measured
on the blocked kernel at K=2048/N=3: 7.2 vs 10.2 us/step/scenario, with
max |dh| ~ 1e-5 on an O(1) wave after 4096 steps; 'default' NaNs the same
rollout.
"""
import jax
import jax.numpy as jnp

_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "default": jax.lax.Precision.DEFAULT,
}


def precision_dot(a, b, prec: str = "highest"):
    """a @ b accumulated in the operand dtype, with `prec` pass count."""
    if prec == "high" and a.dtype == jnp.float32:
        bf = jnp.bfloat16

        def split(x):
            hi = x.astype(bf)
            lo = (x - hi.astype(x.dtype)).astype(bf)
            return hi, lo

        ah, al = split(a)
        bh, bl = split(b)

        def d(x, y):
            return jnp.dot(x, y, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.DEFAULT)

        return d(ah, bh) + d(ah, bl) + d(al, bh)
    if prec == "high":  # non-f32 (x64 interpret-mode parity): exact path
        prec = "highest"
    return jnp.dot(a, b, preferred_element_type=a.dtype,
                   precision=_PRECISIONS[prec])
