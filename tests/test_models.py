"""Problem-generator tests: FEM assembly correctness and .mat round-trip."""

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from hsolve import helmholtz2d, p1_fem_2d, poisson2d, poisson3d, read_problem, \
    write_problem, nested_dissection


def test_p1_stiffness_is_5point():
    n = 8
    K, M = p1_fem_2d(n)
    m = n - 1
    ids = np.arange(m * m).reshape(m, m)
    Kd = K.toarray()
    # on the structured right-triangulation the P1 stiffness is the 5-point stencil
    assert np.allclose(np.diag(Kd), 4.0)
    assert np.allclose(Kd[ids[0, 0], ids[0, 1]], -1.0)
    assert np.allclose(Kd[ids[0, 0], ids[1, 0]], -1.0)
    assert np.allclose(Kd[ids[0, 0], ids[1, 1]], 0.0)
    assert np.allclose(Kd, Kd.T)


def test_mass_matrix_total():
    n = 16
    K, M = p1_fem_2d(n)
    # sum of the interior mass entries approaches the domain area as n grows;
    # exact statement: full mass sums to 1, boundary rows removed -> slightly less
    total = M.sum()
    assert 0.8 < total < 1.0
    assert (M != M.T).nnz == 0


def test_poisson2d_spd_and_solution():
    A, b, shape = poisson2d(16)
    x = spla.spsolve(A.tocsc(), b)
    # u(0.5, 0.5) for -lap u = 1 on unit square with zero BC is about 0.0737
    m = shape[0]
    center = (m // 2) * m + m // 2
    assert abs(x[center] - 0.0737) < 5e-3
    ev = spla.eigsh(A, k=1, which="SA", return_eigenvectors=False)
    assert ev[0] > 0


def test_helmholtz_indefinite():
    A, b, shape = helmholtz2d(32, k=40.0)
    ev_lo = spla.eigsh(A, k=1, which="SA", return_eigenvectors=False)
    ev_hi = spla.eigsh(A, k=1, which="LA", return_eigenvectors=False)
    assert ev_lo[0] < 0 < ev_hi[0]


def test_poisson3d_shape():
    A, b, shape = poisson3d(8)
    assert A.shape == (7 ** 3, 7 ** 3)
    assert (abs(A - A.T) > 1e-12).nnz == 0


def test_mat_roundtrip(tmp_path):
    A, b, shape = poisson2d(8)
    tree = nested_dissection(shape, leafmax=10)
    path = str(tmp_path / "prob.mat")
    write_problem(path, A, b, tree)
    A2, b2, tree2 = read_problem(path)
    assert np.allclose((A - A2).toarray() if sp.issparse(A2) else 0, 0)
    np.testing.assert_allclose(b, b2)
    assert tree2.nnodes == tree.nnodes
    for i in range(tree.nnodes):
        np.testing.assert_array_equal(tree.int_idx[i], tree2.int_idx[i])
