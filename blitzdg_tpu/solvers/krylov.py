"""Matrix-free Krylov solvers in pure JAX: CG and restarted GMRES.

Device-resident replacements for the reference's header-only GMRES
(/root/reference/include/GMRESSolver.hpp:212-430: right-preconditioned
restarts, modified Gram-Schmidt, Givens-free least-squares finish, ConvFlag
taxonomy) and for the LAPACK/UMFPACK direct solvers it leans on.

Design notes (TPU-first):
 - everything is `lax.while_loop`/`fori_loop` with static shapes; the
   Krylov basis is a dense (m+1, n) array living in HBM;
 - dot products are `jnp.vdot` — under pjit sharding XLA lowers them to
   `psum` over the element axis automatically (SURVEY.md §2.9);
 - solvers operate on flat vectors; callers flatten (K, Np) fields; batch
   over scenarios with `jax.vmap`;
 - convergence bookkeeping mirrors the reference ConvFlag taxonomy where it
   is meaningful for fixed-shape execution (converged / maxits / breakdown).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

# Convergence flags (reference analog: GMRESSolver.hpp:64-75).
CONV_SUCCESS = 0
CONV_MAXITS = 1
CONV_BREAKDOWN = 2
CONV_INF_OR_NAN = 3
CONV_DIVERGED = 4  # residual grew past div_tol * ||r0|| (GMRESSolver.hpp:67)
CONV_STAGNATION = 5  # |dx_i| <= stg_tol*|x_i| for all i (GMRESSolver.hpp:158)


class SolveResult(NamedTuple):
    x: jnp.ndarray
    iters: jnp.ndarray  # iterations (CG) or outer restarts (GMRES)
    relres: jnp.ndarray
    flag: jnp.ndarray


def cg(
    matvec: Callable,
    b: jnp.ndarray,
    x0: jnp.ndarray | None = None,
    *,
    tol: float = 1e-6,
    maxiter: int = 1000,
    precon: Callable | None = None,
) -> SolveResult:
    """Preconditioned conjugate gradients for SPD operators."""
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if precon is None:
        precon = lambda v: v

    bnorm = jnp.linalg.norm(b)
    bnorm = jnp.where(bnorm > 0, bnorm, 1.0)

    r0 = b - matvec(x0)
    z0 = precon(r0)
    rn0 = jnp.linalg.norm(r0)
    # (x, r, z, p, rz, it, broke, best residual norm, best iterate)
    state0 = (x0, r0, z0, z0, jnp.vdot(r0, z0), jnp.asarray(0),
              jnp.asarray(False), rn0, x0)

    def cond(state):
        _, r, *_, it, broke, _, _ = state
        return (~broke) & (jnp.linalg.norm(r) / bnorm > tol) & (it < maxiter)

    def body(state):
        x, r, z, p, rz, it, _, rmin, xbest = state
        Ap = matvec(p)
        pAp = jnp.vdot(p, Ap)
        # Breakdown/divergence guards (reference analog: the GMRESSolver.hpp
        # ConvFlag taxonomy). On a semi-definite operator — or in low
        # precision — roundoff pushes p into the nullspace: pAp -> 0 makes
        # alpha explode instantly, and a residual nullspace component makes
        # x grow without bound gradually. Catch both: stop on non-positive
        # pAp, and stop when the residual norm has grown far past its best,
        # returning the best iterate seen.
        ok = jnp.isfinite(pAp) & (pAp.real > 0)
        alpha = jnp.where(ok, rz / jnp.where(ok, pAp, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        rn = jnp.linalg.norm(r)
        improved = rn < rmin
        xbest = jnp.where(improved, x, xbest)
        rmin = jnp.minimum(rn, rmin)
        diverging = ~jnp.isfinite(rn) | (rn > 1e4 * rmin)
        z = precon(r)
        rz_new = jnp.vdot(r, z)
        beta = jnp.where(ok, rz_new / rz, 0.0)
        p = z + beta * p
        return (x, r, z, p, jnp.where(ok, rz_new, rz), it + 1,
                ~ok | diverging, rmin, xbest)

    x, r, *_, it, broke, rmin, xbest = jax.lax.while_loop(cond, body, state0)
    rn = jnp.linalg.norm(r)
    use_best = ~jnp.isfinite(rn) | (rmin < rn)
    x = jnp.where(use_best, xbest, x)
    relres = jnp.where(use_best, rmin, rn) / bnorm
    flag = jnp.where(
        relres <= tol,
        CONV_SUCCESS,
        jnp.where(
            ~jnp.isfinite(relres),
            CONV_INF_OR_NAN,
            jnp.where(broke, CONV_BREAKDOWN, CONV_MAXITS),
        ),
    )
    return SolveResult(x=x, iters=it, relres=relres, flag=flag)


def gmres(
    matvec: Callable,
    b: jnp.ndarray,
    x0: jnp.ndarray | None = None,
    *,
    tol: float = 1e-6,
    restart: int = 30,
    maxiter: int = 100,
    precon: Callable | None = None,
    div_tol: float = 1e5,
    stg_tol: float = 1e-12,
) -> SolveResult:
    """Right-preconditioned restarted GMRES(m).

    Arnoldi with modified Gram-Schmidt; the small (m+1, m) Hessenberg least
    squares is solved densely per cycle (tiny, stays on device). ``maxiter``
    counts outer restart cycles (reference defaults kspaceSz=30, maxits=100,
    relTol=1e-6, divTol=1e5, stgTol=1e-12 — GMRESSolver.hpp:94-108).
    Termination taxonomy mirrors the reference ConvFlag enum
    (GMRESSolver.hpp:64-75): success / maxits / inf_or_nan, plus
    diverged (``||r|| >= div_tol*||r0||``, GMRESSolver.hpp:364) and
    stagnation (per-cycle solution update below ``stg_tol`` elementwise,
    GMRESSolver.hpp:416-427).
    """
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if precon is None:
        precon = lambda v: v

    n = b.shape[0]
    m = restart
    dtype = b.dtype

    bnorm = jnp.linalg.norm(b)
    bnorm = jnp.where(bnorm > 0, bnorm, 1.0)

    def arnoldi_cycle(x):
        r = b - matvec(x)
        beta = jnp.linalg.norm(r)

        V = jnp.zeros((m + 1, n), dtype=dtype)
        H = jnp.zeros((m + 1, m), dtype=dtype)
        V = V.at[0].set(r / jnp.where(beta > 0, beta, 1.0))

        def arnoldi_step(j, carry):
            V, H = carry
            w = matvec(precon(V[j]))
            # modified Gram-Schmidt against all basis vectors (masked > j)
            def mgs(i, wh):
                w, H = wh
                hij = jnp.where(i <= j, jnp.vdot(V[i], w), 0.0)
                w = w - hij * V[i]
                H = H.at[i, j].set(hij)
                return (w, H)

            w, H = jax.lax.fori_loop(0, m + 1, mgs, (w, H))
            hnext = jnp.linalg.norm(w)
            H = H.at[j + 1, j].set(hnext)
            V = V.at[j + 1].set(w / jnp.where(hnext > 1e-30, hnext, 1.0))
            return (V, H)

        V, H = jax.lax.fori_loop(0, m, arnoldi_step, (V, H))

        # least squares: min || beta e1 - H y ||
        e1 = jnp.zeros((m + 1,), dtype=dtype).at[0].set(beta)
        y = jnp.linalg.lstsq(H, e1)[0]
        dx = precon(V[:m].T @ y)
        x_new = x + dx
        res = jnp.linalg.norm(b - matvec(x_new))
        # stagnation: every component moved by <= stg_tol relative to the
        # iterate (GMRESSolver.hpp:416-420, inverted sense).
        stag = jnp.all(jnp.abs(dx) <= stg_tol * jnp.abs(x_new))
        return x_new, res, stag

    res0 = jnp.linalg.norm(b - matvec(x0))
    false_ = jnp.asarray(False)
    state0 = (x0, res0, jnp.asarray(0), false_, false_)

    def cond(state):
        _, res, it, stag, div = state
        return ((res / bnorm > tol) & (it < maxiter) & jnp.isfinite(res)
                & ~stag & ~div)

    def body(state):
        x, _, it, _, _ = state
        x, res, stag = arnoldi_cycle(x)
        div = res >= div_tol * res0
        return (x, res, it + 1, stag, div)

    x, res, it, stag, div = jax.lax.while_loop(cond, body, state0)
    relres = res / bnorm
    flag = jnp.where(
        relres <= tol,
        CONV_SUCCESS,
        jnp.where(
            ~jnp.isfinite(relres),
            CONV_INF_OR_NAN,
            jnp.where(
                div,
                CONV_DIVERGED,
                jnp.where(stag, CONV_STAGNATION, CONV_MAXITS),
            ),
        ),
    )
    return SolveResult(x=x, iters=it, relres=relres, flag=flag)
