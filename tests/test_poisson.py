"""Elliptic-path tests: Krylov solvers + matrix-free IP Poisson operators +
host-side assembled SIP oracle.

Reference configs: poisson1d (src/poisson1d/main.cpp:42-43, N=4, K=15),
poisson2d (src/poisson2d/main.cpp:43,93-97: N=2, box mesh, GMRES
kspace=300, relTol=1e-4, manufactured sin*sin solution).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blitzdg_tpu.mesh import box_triangles
from blitzdg_tpu.ops.poisson import (
    apply_mass,
    assemble_poisson2d,
    poisson1d_op,
    poisson2d_op,
)
from blitzdg_tpu.solvers.krylov import CONV_SUCCESS, cg, gmres
from blitzdg_tpu.specgrid.nodes1d import build_nodes1d
from blitzdg_tpu.specgrid.triangle import build_triangle_context


class TestKrylov:
    def test_cg_dense_spd(self):
        rng = np.random.default_rng(0)
        A = rng.normal(size=(40, 40))
        A = A @ A.T + 40 * np.eye(40)
        b = rng.normal(size=40)
        res = cg(lambda v: jnp.asarray(A) @ v, jnp.asarray(b), tol=1e-10)
        np.testing.assert_allclose(np.asarray(res.x), np.linalg.solve(A, b), atol=1e-8)
        assert int(res.flag) == CONV_SUCCESS

    def test_gmres_dense_nonsymmetric(self):
        rng = np.random.default_rng(1)
        A = rng.normal(size=(50, 50)) + 10 * np.eye(50)
        b = rng.normal(size=50)
        res = gmres(lambda v: jnp.asarray(A) @ v, jnp.asarray(b), tol=1e-10, restart=25)
        np.testing.assert_allclose(np.asarray(res.x), np.linalg.solve(A, b), atol=1e-7)
        assert int(res.flag) == CONV_SUCCESS

    def test_cg_breakdown_does_not_diverge(self):
        """On a singular PSD system with a RHS component in the nullspace,
        plain CG would blow up once p drifts into the nullspace (pAp -> 0,
        alpha -> inf). The guard must freeze the iterate and flag breakdown
        rather than returning garbage."""
        A = np.zeros((12, 12))
        A[:8, :8] = np.diag(np.arange(1.0, 9.0))
        b = np.ones(12)  # has nullspace component: tol unreachable
        res = cg(lambda v: jnp.asarray(A) @ v, jnp.asarray(b), tol=1e-14,
                 maxiter=200)
        assert int(res.flag) != CONV_SUCCESS
        assert np.all(np.isfinite(np.asarray(res.x)))
        # the reported residual can never beat the nullspace component
        # (norm 2 over bnorm ~ 3.46) but must not be garbage either
        assert 0.1 < float(res.relres) < 10.0

    def test_cg_singular_consistent_converges(self):
        """b in range(A): CG restricted to the range converges normally."""
        A = np.zeros((12, 12))
        A[:8, :8] = np.diag(np.arange(1.0, 9.0))
        b = np.zeros(12)
        b[:8] = 1.0
        res = cg(lambda v: jnp.asarray(A) @ v, jnp.asarray(b), tol=1e-12,
                 maxiter=100)
        assert int(res.flag) == CONV_SUCCESS
        np.testing.assert_allclose(np.asarray(res.x)[:8],
                                   1.0 / np.arange(1.0, 9.0), atol=1e-10)

    def test_gmres_singular_flags_no_convergence(self):
        # singular system: should hit maxiter, not silently "converge"
        A = np.zeros((10, 10))
        A[:9, :9] = np.eye(9)
        b = np.ones(10)
        res = gmres(lambda v: jnp.asarray(A) @ v, jnp.asarray(b), tol=1e-12, maxiter=3)
        assert int(res.flag) != CONV_SUCCESS

    def test_gmres_jit_and_batch(self):
        rng = np.random.default_rng(2)
        A = rng.normal(size=(30, 30)) + 8 * np.eye(30)
        B = rng.normal(size=(4, 30))
        solve = jax.jit(
            jax.vmap(lambda b: gmres(lambda v: jnp.asarray(A) @ v, b, tol=1e-10).x)
        )
        X = np.asarray(solve(jnp.asarray(B)))
        np.testing.assert_allclose(X, np.linalg.solve(A, B.T).T, atol=1e-6)


class TestPoisson1D:
    def test_sip_solve_manufactured(self):
        """-u'' = pi^2 sin(pi x) on [-1, 1], u(+-1)=0, u = sin(pi x)."""
        ctx = build_nodes1d(4, 15, -1.0, 1.0)
        f = (np.pi**2) * jnp.sin(np.pi * ctx.x)
        # operator returns J*M*(Laplacian u); solve -L u = J M f with CG
        b = apply_mass(ctx, f).reshape(-1)

        def matvec(v):
            return -poisson1d_op(ctx, v.reshape(ctx.k_elem, ctx.n_p)).reshape(-1)

        res = cg(matvec, b, tol=1e-10, maxiter=2000)
        u = np.asarray(res.x).reshape(ctx.k_elem, ctx.n_p)
        exact = np.sin(np.pi * np.asarray(ctx.x))
        assert int(res.flag) == CONV_SUCCESS
        np.testing.assert_allclose(u, exact, atol=2e-5)

    def test_operator_symmetric(self):
        ctx = build_nodes1d(3, 8, 0.0, 1.0)
        n = ctx.k_elem * ctx.n_p
        A = np.zeros((n, n))
        for i in range(n):
            e = np.zeros(n)
            e[i] = 1.0
            A[:, i] = np.asarray(
                poisson1d_op(ctx, jnp.asarray(e.reshape(ctx.k_elem, ctx.n_p)))
            ).reshape(-1)
        np.testing.assert_allclose(A, A.T, atol=1e-9)
        # negative definite
        w = np.linalg.eigvalsh(A)
        assert np.all(w < 1e-8)


class TestPoisson2D:
    def setup_method(self, _):
        self.mesh = box_triangles(6, 6)
        self.ctx = build_triangle_context(3, self.mesh)

    def test_ip_solve_manufactured_gmres(self):
        """Laplacian u = -2 pi^2 sin(pi x) sin(pi y) with u=0 on the box
        boundary (Wall tag -> Dirichlet), via the matrix-free operator and
        GMRES (reference poisson2d path)."""
        ctx = self.ctx
        uex = jnp.sin(np.pi * ctx.x) * jnp.sin(np.pi * ctx.y)
        f = -2.0 * np.pi**2 * uex

        def matvec(v):
            return poisson2d_op(ctx, v.reshape(ctx.k_elem, ctx.n_p)).reshape(-1)

        res = gmres(matvec, f.reshape(-1), tol=1e-8, restart=200, maxiter=20)
        u = np.asarray(res.x).reshape(ctx.k_elem, ctx.n_p)
        err = np.max(np.abs(u - np.asarray(uex)))
        assert int(res.flag) == CONV_SUCCESS
        assert err < 5e-3, err

    def test_symmetrized_operator_with_cg(self):
        ctx = self.ctx
        uex = jnp.sin(np.pi * ctx.x) * jnp.sin(np.pi * ctx.y)
        f = -2.0 * np.pi**2 * uex
        b = -apply_mass(ctx, f).reshape(-1)

        def matvec(v):
            return -poisson2d_op(
                ctx, v.reshape(ctx.k_elem, ctx.n_p), symmetrize=True
            ).reshape(-1)

        res = cg(matvec, b, tol=1e-9, maxiter=4000)
        u = np.asarray(res.x).reshape(ctx.k_elem, ctx.n_p)
        err = np.max(np.abs(u - np.asarray(uex)))
        assert int(res.flag) == CONV_SUCCESS
        assert err < 5e-3, err

    def test_assembled_oracle_solve(self):
        """Host-assembled SIP operator + scipy direct solve reproduces the
        manufactured solution (reference poisson2d.py splu path)."""
        import scipy.sparse.linalg as spla

        ctx = self.ctx
        OP, MM = assemble_poisson2d(ctx)
        uex = np.asarray(jnp.sin(np.pi * ctx.x) * jnp.sin(np.pi * ctx.y)).reshape(-1)
        f = 2.0 * np.pi**2 * uex  # OP is the positive form: OP u = MM f
        u = spla.spsolve(OP.tocsc(), MM @ f)
        err = np.max(np.abs(u - uex))
        assert err < 5e-3, err

    def test_assembled_operator_spd(self):
        OP, _ = assemble_poisson2d(self.ctx)
        A = OP.toarray()
        np.testing.assert_allclose(A, A.T, atol=1e-8 * np.abs(A).max())
        w = np.linalg.eigvalsh(0.5 * (A + A.T))
        assert np.all(w > -1e-6)


class TestGMRESFlags:
    """Extended ConvFlag taxonomy (reference GMRESSolver.hpp:64-75)."""

    def test_gmres_stagnation_flag(self):
        from blitzdg_tpu.solvers.krylov import CONV_STAGNATION

        # singular consistent-ish system where the update stalls: with a
        # huge stg_tol any nonzero first cycle is "stagnant" on cycle 2
        rng = np.random.default_rng(3)
        A = rng.normal(size=(20, 20)) + 10 * np.eye(20)
        b = jnp.asarray(rng.normal(size=20))
        res = gmres(lambda v: jnp.asarray(A) @ v, b, tol=1e-30, restart=2,
                    maxiter=50, stg_tol=1e30)
        assert int(res.flag) == CONV_STAGNATION

    def test_gmres_diverged_flag(self):
        from blitzdg_tpu.solvers.krylov import CONV_DIVERGED

        # operator whose GMRES(1) residual grows: use div_tol < 1 so any
        # non-decreasing residual trips the divergence check
        rng = np.random.default_rng(4)
        Q = np.linalg.qr(rng.normal(size=(16, 16)))[0]
        A = Q @ np.diag(np.linspace(1e-6, 1.0, 16)) @ Q.T  # ill-conditioned
        b = jnp.asarray(rng.normal(size=16))
        res = gmres(lambda v: jnp.asarray(A) @ v, b, tol=1e-30, restart=1,
                    maxiter=100, div_tol=1e-12)
        assert int(res.flag) == CONV_DIVERGED

    def test_gmres_defaults_still_converge(self):
        rng = np.random.default_rng(5)
        A = rng.normal(size=(24, 24)) + 8 * np.eye(24)
        b = jnp.asarray(rng.normal(size=24))
        res = gmres(lambda v: jnp.asarray(A) @ v, b, tol=1e-10)
        assert int(res.flag) == CONV_SUCCESS
        np.testing.assert_allclose(
            np.asarray(res.x), np.linalg.solve(A, np.asarray(b)), atol=1e-7
        )
