"""Low-rank compressed factorization: preconditioner quality and GMRES parity.

Parity model: the reference's compressed mode (``factor(A, nd, nd_loc; swlevel=-2,
atol=rtol=1e-2, ...)``, test/rungmres.jl:39) used as a right preconditioner converges
GMRES in a few iterations; tighter tolerances converge in fewer."""

import numpy as np
import pytest
import scipy.sparse.linalg as spla

from hsolve import (SolverOptions, ell_matvec, factor, gmres, helmholtz2d,
                    nested_dissection, poisson2d, to_ell)


def _gmres_iters(A, b, F, reltol=1e-9):
    ell = to_ell(A)
    x, info = gmres(lambda v: ell_matvec(ell, v), np.asarray(b), M=F.solve,
                    reltol=reltol, restart=30, maxiter=90)
    res = np.linalg.norm(A @ np.asarray(x) - np.asarray(b)) / np.linalg.norm(b)
    return info, res


def test_compressed_tight_tolerance_is_near_exact():
    A, b, shape = poisson2d(33)
    tree = nested_dissection(shape, leafmax=40)
    F = factor(A, tree, swlevel=-2, atol=1e-12, rtol=1e-12)
    assert F.maxrank() > 0  # compression actually happened
    x = np.asarray(F.solve(b))
    x_ref = spla.spsolve(A.tocsc(), b)
    assert np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref) < 1e-8


def test_compressed_preconditioner_gmres():
    A, b, shape = helmholtz2d(64, k=20.0)
    tree = nested_dissection(shape, leafmax=100)
    F = factor(A, tree, swlevel=-2, swsize=16, atol=1e-4, rtol=1e-4)
    info, res = _gmres_iters(A, b, F)
    assert info["converged"]
    assert info["iters"] <= 15
    assert res < 1e-9


def test_tolerance_monotonicity():
    """Tighter compression tolerance must not need more GMRES iterations."""
    A, b, shape = poisson2d(33)
    tree = nested_dissection(shape, leafmax=30)
    iters = []
    for tol in (1e-2, 1e-6):
        F = factor(A, tree, swlevel=-3, swsize=8, atol=tol, rtol=tol)
        info, res = _gmres_iters(A, b, F)
        assert info["converged"] and res < 1e-9
        iters.append(info["iters"])
    assert iters[1] <= iters[0]


def test_maxrank_reflects_tolerance():
    A, b, shape = poisson2d(33)
    tree = nested_dissection(shape, leafmax=30)
    F_loose = factor(A, tree, swlevel=-3, swsize=8, atol=1e-1, rtol=1e-1)
    F_tight = factor(A, tree, swlevel=-3, swsize=8, atol=1e-10, rtol=1e-10)
    assert 0 < F_loose.maxrank() <= F_tight.maxrank()


def test_swsize_gates_compression():
    A, b, shape = poisson2d(33)
    tree = nested_dissection(shape, leafmax=30)
    F = factor(A, tree, swlevel=-3, swsize=10_000)  # nothing is big enough
    assert F.maxrank() == 0


def test_compressed_3d_end_to_end():
    """3D problems have the fat separators the compressed path exists for
    (quasilinear claim is strongest in 3D, README.md:3 of the reference);
    the HSS-compressed preconditioner must converge GMRES at tol 1e-4."""
    from hsolve import helmholtz3d

    A, b, shape = helmholtz3d(14, k=8.0)
    tree = nested_dissection(shape, leafmax=60)
    F = factor(A, tree, swlevel=-3, swsize=8, atol=1e-4, rtol=1e-4)
    assert F.maxrank() > 0  # compression actually engaged
    info, res = _gmres_iters(A, b, F)
    assert info["converged"] and res < 1e-9
    assert info["iters"] <= 20, info["iters"]
