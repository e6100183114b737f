"""DIA/ELL device SpMV and the mixed-precision compiled GMRES path."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from hsolve import (dia_matvec, ell_matvec, factor, gmres_compiled, helmholtz2d,
                    nested_dissection, spmv_format, to_dia, to_ell)


def _mv(op, v):
    from hsolve.ops.sparse import DiaMatrix

    return dia_matvec(op, v) if isinstance(op, DiaMatrix) else ell_matvec(op, v)


def test_dia_matches_scipy():
    A, b, shape = helmholtz2d(17, k=8.0)
    dia = to_dia(A)
    assert dia is not None
    y = np.asarray(dia_matvec(dia, jnp.asarray(np.asarray(b))))
    ref = A @ np.asarray(b)
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < 1e-13
    # multi-column
    X = np.random.default_rng(0).standard_normal((A.shape[0], 3))
    Y = np.asarray(dia_matvec(dia, jnp.asarray(X)))
    assert np.linalg.norm(Y - A @ X) / np.linalg.norm(A @ X) < 1e-13


def test_dia_fallback_for_scattered_matrix():
    rng = np.random.default_rng(1)
    n = 200
    A = sp.random(n, n, density=0.05, random_state=rng, format="csr")
    A = A + sp.eye(n)
    assert to_dia(A, max_diags=16) is None
    op, mv = spmv_format(A, max_diags=16)
    y = np.asarray(mv(op, jnp.asarray(rng.standard_normal(n))))
    assert y.shape == (n,)


def test_spmv_format_prefers_dia_for_stencils():
    A, _, _ = helmholtz2d(9, k=2.0)
    op, mv = spmv_format(A)
    from hsolve.ops.sparse import DiaMatrix

    assert isinstance(op, DiaMatrix)


def test_gmres_compiled_mixed_precision_reaches_f64_tolerance():
    A, b, shape = helmholtz2d(33, k=10.0)
    b = np.asarray(b)
    tree = nested_dissection(shape, leafmax=60)
    F = factor(A, tree, swlevel=0, dtype=jnp.float32)  # f32 preconditioner

    op64, _ = spmv_format(A, dtype=np.float64)
    op32, _ = spmv_format(A, dtype=np.float32)

    def M(data, v):
        from hsolve.factor import solve_with_data

        return solve_with_data(data, v.astype(jnp.float32)).astype(v.dtype)

    x, info = gmres_compiled(_mv, M, jnp.asarray(b, dtype=jnp.float64),
                             reltol=1e-9, restart=30, maxiter=60,
                             mv_data=op64, M_data=F.solve_data,
                             inner_dtype="float32", mv_data_inner=op32, m_eps=1e-6)
    assert info["converged"]
    res = np.linalg.norm(A @ np.asarray(x, dtype=np.float64) - b) / np.linalg.norm(b)
    assert res < 1e-9
    # the f32 inner cycles + true-residual refinement should need only a handful of
    # iterations with an exact (but reduced-precision) preconditioner
    assert info["iters"] <= 12


def test_explicit_inverse_off_matches_on():
    A, b, shape = helmholtz2d(17, k=6.0)
    b = np.asarray(b)
    tree = nested_dissection(shape, leafmax=24)
    x_on = np.asarray(factor(A, tree, swlevel=0, explicit_inverse=True).solve(b))
    x_off = np.asarray(factor(A, tree, swlevel=0, explicit_inverse=False).solve(b))
    assert np.linalg.norm(x_on - x_off) / np.linalg.norm(x_off) < 1e-9
    x_ref = sp.linalg.spsolve(A.tocsc(), b)
    assert np.linalg.norm(x_on - x_ref) / np.linalg.norm(x_ref) < 1e-10


def test_precision_escalation_near_singular():
    """Reduced-precision Arnoldi cycles have a true-residual floor; on a
    near-singular shifted Laplacian the f32 cycles stall orders of magnitude
    above reltol while the escalating solver (outer-precision residual phase,
    krylov._gmres_escalated) converges - the CI-sized reproduction of the
    helmholtz h=512 divergence (CROSSOVER.md)."""
    from hsolve import poisson2d
    from hsolve.factor import solve_with_data
    from hsolve.planner import plan_factorization
    from hsolve import SolverOptions, factor_with_plan

    A0, b, shape = poisson2d(64)
    lam = sp.linalg.eigsh(A0.tocsc().asfptype(), k=1, sigma=0.3, which="LM",
                          return_eigenvectors=False)[0]
    A = (A0 - (lam + 3e-7) * sp.eye(A0.shape[0], format="csr")).tocsr()
    tree = nested_dissection(shape, leafmax=100)
    opts = SolverOptions(swlevel=0)
    plan = plan_factorization(A, tree, opts)
    F = factor_with_plan(plan, opts, dtype=jnp.float32)
    op64, _ = spmv_format(A, dtype=np.float64)
    op32, _ = spmv_format(A, dtype=np.float32)

    def M(data, v):
        return solve_with_data(data, v.astype(jnp.float32)).astype(v.dtype)

    bj = jnp.asarray(np.asarray(b), jnp.float64)
    x0, i0 = gmres_compiled(_mv, M, bj, reltol=1e-9, restart=30, maxiter=40,
                            mv_data=op64, M_data=F.solve_data,
                            inner_dtype="float32", mv_data_inner=op32,
                            m_eps=1e-6, escalate=False)
    r0 = float(jnp.linalg.norm(_mv(op64, x0) - bj) / jnp.linalg.norm(bj))
    assert not i0["converged"] and r0 > 1e-7   # the f32 floor

    x1, i1 = gmres_compiled(_mv, M, bj, reltol=1e-9, restart=30, maxiter=40,
                            mv_data=op64, M_data=F.solve_data,
                            inner_dtype="float32", mv_data_inner=op32,
                            m_eps=1e-6)
    r1 = float(jnp.linalg.norm(_mv(op64, x1) - bj) / jnp.linalg.norm(bj))
    assert i1["converged"] and r1 < 1e-9
