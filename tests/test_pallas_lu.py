"""Pallas blocked-LU kernel vs the XLA reference factorization (interpret mode on the
CPU test mesh; the compiled path is exercised by the TPU bench)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hsolve.ops.dense import lu_solve
from hsolve.ops.pallas_lu import pallas_lu


@pytest.mark.parametrize("B,n,bs", [(3, 64, 32), (2, 128, 64), (1, 256, 128)])
def test_pallas_lu_matches_direct(B, n, bs):
    key = jax.random.PRNGKey(0)
    D = jax.random.normal(key, (B, n, n), dtype=jnp.float32)
    D = D + n * jnp.eye(n, dtype=jnp.float32) * 0.1
    lu, piv = pallas_lu(D, bs=bs, interpret=True)
    # reconstruct: D[perm] = L @ U
    L = jnp.tril(lu, -1) + jnp.eye(n)
    U = jnp.triu(lu)
    rec = L @ U
    Dp = jnp.take_along_axis(D, piv[:, :, None], axis=1)
    err = jnp.linalg.norm(rec - Dp) / jnp.linalg.norm(Dp)
    assert float(err) < 1e-4

    # and it must plug into the shared solve contract
    b = jax.random.normal(jax.random.PRNGKey(1), (B, n, 2), dtype=jnp.float32)
    x = lu_solve(lu, piv, b)
    res = jnp.linalg.norm(D @ x - b) / jnp.linalg.norm(b)
    assert float(res) < 1e-3


def test_pallas_lu_with_identity_padding():
    """The planner's padded fronts (identity diagonal block) must factor cleanly."""
    n, real = 128, 70
    key = jax.random.PRNGKey(2)
    D = jnp.zeros((1, n, n), dtype=jnp.float32)
    A = jax.random.normal(key, (real, real), dtype=jnp.float32) + \
        10 * jnp.eye(real, dtype=jnp.float32)
    D = D.at[0, :real, :real].set(A)
    D = D.at[0, jnp.arange(real, n), jnp.arange(real, n)].set(1.0)
    lu, piv = pallas_lu(D, bs=64, interpret=True)
    b = jnp.zeros((1, n, 1), dtype=jnp.float32).at[0, :real, 0].set(
        jax.random.normal(jax.random.PRNGKey(3), (real,), dtype=jnp.float32))
    x = lu_solve(lu, piv, b)
    res = jnp.linalg.norm(D @ x - b) / jnp.linalg.norm(b)
    assert float(res) < 1e-3
    assert float(jnp.max(jnp.abs(x[0, real:]))) < 1e-5
