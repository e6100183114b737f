"""Complex (damped Helmholtz) end-to-end coverage.

The reference's wave use case is complex impedance Helmholtz (README.md:7; the
``helmholtz2d`` damping term mirrors ``K - k^2 M - i k damping M``).  Exercises
complex factorization (exact + compressed), complex GMRES, and the split-real
formulation used on TPU (where the transport carries no complex buffers).
"""

import numpy as np
import pytest

import hsolve


@pytest.fixture(scope="module")
def problem():
    A, b, shape = hsolve.helmholtz2d(48, k=25.0, damping=0.1)
    tree = hsolve.nested_dissection(shape, leafmax=60)
    return A, np.asarray(b), tree


def test_complex_exact_direct(problem):
    A, b, tree = problem
    assert np.iscomplexobj(A.data)
    F = hsolve.factor(A, tree, swlevel=0)
    x = np.asarray(F.solve(b))
    assert np.linalg.norm(A @ x - b) / np.linalg.norm(b) < 1e-11


def test_complex_exact_gmres_one_iter(problem):
    A, b, tree = problem
    F = hsolve.factor(A, tree, swlevel=0)
    ell = hsolve.to_ell(A)
    x, info = hsolve.gmres(lambda v: hsolve.ell_matvec(ell, v), b, M=F.solve,
                           reltol=1e-9, restart=30, maxiter=30)
    assert info["iters"] == 1 and info["converged"]


def test_complex_compressed_gmres(problem):
    A, b, tree = problem
    F = hsolve.factor(A, tree, swlevel=-2, swsize=1, atol=1e-4, rtol=1e-4)
    assert F.maxrank() > 0
    ell = hsolve.to_ell(A)
    x, info = hsolve.gmres(lambda v: hsolve.ell_matvec(ell, v), b, M=F.solve,
                           reltol=1e-9, restart=30, maxiter=30)
    relres = np.linalg.norm(A @ np.asarray(x) - b) / np.linalg.norm(b)
    assert info["converged"] and relres < 1e-8


def test_split_real_formulation_matches(problem):
    """The TPU path solves the real-equivalent 2N system [[Ar,-Ai],[Ai,Ar]] with the
    complex factorization as preconditioner; verify it reaches the same solution."""
    import jax.numpy as jnp
    import scipy.sparse as sp

    from bench import _FD, _mv_split, _precond_split

    A, b, tree = problem
    F = hsolve.factor(A, tree, swlevel=0)
    _FD[0] = jnp.complex128
    Ar = sp.csr_matrix((A.data.real, A.indices, A.indptr), shape=A.shape)
    Ai = sp.csr_matrix((A.data.imag, A.indices, A.indptr), shape=A.shape)
    ops = tuple(hsolve.spmv_format(M_, dtype=np.float64)[0] for M_ in (Ar, Ai))
    b2 = jnp.concatenate([jnp.asarray(b.real), jnp.asarray(b.imag)])
    x2, info = hsolve.gmres_compiled(_mv_split, _precond_split, b2, reltol=1e-9,
                                     restart=30, maxiter=30, mv_data=ops,
                                     M_data=F.solve_data)
    n = A.shape[0]
    x = np.asarray(x2[:n]) + 1j * np.asarray(x2[n:])
    relres = np.linalg.norm(A @ x - b) / np.linalg.norm(b)
    assert info["converged"] and relres < 1e-9
