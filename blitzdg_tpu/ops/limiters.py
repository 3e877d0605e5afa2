"""Slope/positivity limiters for shallow-water wetting and drying.

Functional parity target: swhelpers/limiters.py —
positivityPreservingLimiter2D (:3-21, mean-preserving squash toward the
cell mean) and surfaceReconstruction (:36-81, hydrostatic minmod
reconstruction of face traces). Vectorized JAX (no per-node Python loops).
"""
from __future__ import annotations

import jax.numpy as jnp


def positivity_preserving_limiter(h, hu, hv, h_floor: float = 1e-3,
                                  weights: jnp.ndarray | None = None):
    """Mean-preserving linear squash keeping h >= ~h_floor.

    ``weights`` (Np,) gives true cell averages (quadrature weights / total);
    None reproduces the reference's arithmetic nodal mean
    (swhelpers/limiters.py:10).
    """
    if weights is None:
        mean = lambda f: jnp.mean(f, axis=-1, keepdims=True)
    else:
        wsum = jnp.sum(weights)
        mean = lambda f: jnp.sum(f * weights[None, :], axis=-1, keepdims=True) / wsum

    # Standard Zhang-Shu squash factor. Deliberately NOT the reference's
    # theta = hmean/(hmean - max(hmin,1e-3) + 1e-4) (swhelpers/limiters.py:
    # 3-21), which never engages for healthy means (theta > 1 whenever
    # hmean >> 1e-3) and goes negative when hmean < the floor.
    hmin = jnp.min(h, axis=-1, keepdims=True)
    hmean = mean(h)
    need = hmin < h_floor
    denom = jnp.where(need, hmean - hmin, 1.0)
    theta = jnp.where(
        need,
        jnp.clip((hmean - h_floor) / jnp.where(denom > 0, denom, 1.0), 0.0, 1.0),
        1.0,
    )

    humean, hvmean = mean(hu), mean(hv)
    return (
        hmean + theta * (h - hmean),
        humean + theta * (hu - humean),
        hvmean + theta * (hv - hvmean),
    )


def minmod(a, b):
    """Elementwise minmod with the reference's comparison semantics
    (swhelpers/limiters.py:24-34): the smaller *value* when signs agree,
    else 0. NOTE: this is NOT the textbook smaller-magnitude minmod for
    negative pairs — surface_reconstruction's clamping against the fixed
    +-1e-3 arguments relies on these exact semantics."""
    same_sign = a * b > 0
    pick_a = (a < b) & same_sign
    pick_b = (b < a) & same_sign
    return jnp.where(pick_a, a, jnp.where(pick_b, b, 0.0))


def surface_reconstruction(etaM, hM, etaP, hP, h_floor: float = 1e-3):
    """Hydrostatic (well-balanced) reconstruction of face traces for
    wetting/drying: reconstruct bed elevations, limit the '+' surface, and
    floor the water columns (reference swhelpers/limiters.py:36-81)."""
    zM = etaM - hM
    zP = etaP - hP
    ones = jnp.full_like(zM, 1e-3)
    dz = (zP - 0.5 * minmod(zP - zM, ones)) - (zM + 0.5 * minmod(zM - zP, -ones))

    etaCorrP = zM - zP - dz
    etaCorrP = jnp.minimum(etaCorrP, etaM - etaP)
    etaP = jnp.where(etaCorrP > 0, etaP + etaCorrP, etaP)

    zP = etaP - hP
    maxz = jnp.maximum(zM, zP)
    hM_new = jnp.maximum(etaM - maxz, h_floor)
    hP_new = jnp.maximum(etaP - maxz, h_floor)
    return hM_new, hP_new
