"""HSS core tests: compression round-trip, matvec, entries, sub-blocks, generators,
randomized construction, and the telescoping-Woodbury solve (ULV-equivalent).

Validation model mirrors SURVEY.md section 4's prescription: HSS compress -> densify
round-trips against NumPy on kernel matrices with decaying off-diagonal rank."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hsolve.ops.hss import (ClusterPlan, Hss, SampleOps, generators,
                            hss_compress_dense, hss_entries, hss_factor, hss_matvec,
                            hss_rank, hss_randcompress, hss_solve, hss_sub,
                            hss_todense, plan_cluster)


def _kernel_matrix(n, diag=4.0):
    """Smooth off-diagonal kernel + strong diagonal: classic HSS-compressible."""
    i = np.arange(n)
    A = 1.0 / (1.0 + np.abs(i[:, None] - i[None, :]) ** 1.5)
    A = A + diag * np.eye(n)
    return jnp.asarray(A)


@pytest.fixture(scope="module")
def hss_pair():
    n = 256
    A = _kernel_matrix(n)
    plan = ClusterPlan(ls=32, depth=3, n1=128, n2=128)
    h = hss_compress_dense(A, plan, atol=1e-10, rtol=1e-10, cap=24)
    return A, h


def test_plan_cluster_shapes():
    p = plan_cluster(100, 60, leafsize=32)
    assert p.n_pad >= 200 and p.nleaves == 2 ** p.depth
    assert p.half >= 100 and p.n_pad - p.half >= 60
    emb = p.embed()
    assert (emb < 160).sum() == 160


def test_compress_dense_roundtrip(hss_pair):
    A, h = hss_pair
    err = jnp.linalg.norm(hss_todense(h) - A) / jnp.linalg.norm(A)
    assert err < 1e-7


def test_matvec(hss_pair):
    A, h = hss_pair
    x = jax.random.normal(jax.random.PRNGKey(0), (A.shape[0], 3))
    y = hss_matvec(h, x)
    assert jnp.linalg.norm(y - A @ x) / jnp.linalg.norm(A @ x) < 1e-7
    yt = hss_matvec(h, x, adjoint=True)
    assert jnp.linalg.norm(yt - A.T @ x) / jnp.linalg.norm(A.T @ x) < 1e-7


def test_entries(hss_pair):
    A, h = hss_pair
    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.integers(0, A.shape[0], size=37))
    cols = jnp.asarray(rng.integers(0, A.shape[0], size=23))
    E = hss_entries(h, rows, cols)
    ref = A[np.asarray(rows)[:, None], np.asarray(cols)[None, :]]
    assert jnp.max(jnp.abs(E - ref)) < 1e-7


def test_sub_blocks(hss_pair):
    A, h = hss_pair
    half = h.plan.half
    h11 = hss_sub(h, 0)
    h22 = hss_sub(h, 1)
    assert jnp.linalg.norm(hss_todense(h11) - A[:half, :half]) < 1e-6
    assert jnp.linalg.norm(hss_todense(h22) - A[half:, half:]) < 1e-6


def test_generators_offdiag(hss_pair):
    A, h = hss_pair
    half = h.plan.half
    U1, V1, U2, V2 = generators(h)
    B12 = h.B12s[-1][0]
    B21 = h.B21s[-1][0]
    assert jnp.linalg.norm(U1 @ B12 @ V2.T - A[:half, half:]) < 1e-6
    assert jnp.linalg.norm(U2 @ B21 @ V1.T - A[half:, :half]) < 1e-6


def test_hss_rank(hss_pair):
    _, h = hss_pair
    r = hss_rank(h)
    assert 0 < r <= 24


def test_randcompress_matches_dense(hss_pair):
    A, h_direct = hss_pair
    plan = h_direct.plan

    ops = SampleOps(
        sample=lambda X, adj: (A.T if adj else A) @ X,
        blocks=lambda rows, cols: A[rows[..., :, None], cols[..., None, :]],
    )
    h = hss_randcompress(ops, plan, jax.random.PRNGKey(42), atol=1e-9, rtol=1e-9,
                         cap=24, kest=20)
    err = jnp.linalg.norm(hss_todense(h) - A) / jnp.linalg.norm(A)
    assert err < 1e-6


def test_factor_solve(hss_pair):
    A, h = hss_pair
    sol = hss_factor(h)
    b = jax.random.normal(jax.random.PRNGKey(1), (A.shape[0], 2))
    x = hss_solve(sol, b)
    assert jnp.linalg.norm(A @ x - b) / jnp.linalg.norm(b) < 1e-6
    xt = hss_solve(sol, b, adjoint=True)
    assert jnp.linalg.norm(A.T @ xt - b) / jnp.linalg.norm(b) < 1e-6


def test_factor_solve_padded_identity():
    """Padding rows (identity diagonal, zero couplings) must not disturb the solve."""
    n, pad = 96, 32
    A = np.asarray(_kernel_matrix(n))
    Ap = np.eye(n + pad)
    Ap[:n, :n] = A
    plan = ClusterPlan(ls=16, depth=3, n1=64, n2=64)
    h = hss_compress_dense(jnp.asarray(Ap), plan, atol=1e-10, rtol=1e-10, cap=20)
    sol = hss_factor(h)
    b = np.zeros((n + pad, 1))
    b[:n, 0] = np.random.default_rng(3).standard_normal(n)
    x = hss_solve(sol, jnp.asarray(b))
    x_ref = np.linalg.solve(A, b[:n])
    assert np.linalg.norm(np.asarray(x[:n]) - x_ref) / np.linalg.norm(x_ref) < 1e-6
    assert np.max(np.abs(np.asarray(x[n:]))) < 1e-8
