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
