"""Device-side sparse matvec in ELL (padded-row) format.

The reference applies the sparse matrix only inside GMRES (``test/rungmres.jl:47-48``,
via IterativeSolvers) and for sub-block extraction (handled at plan time, see
hsolve.planner).  For the device matvec we use ELLPACK: rows padded to the max
nonzeros-per-row, which turns SpMV into a gather plus a small reduction - fully static
shapes, vectorizes on the VPU, and trivially shardable by rows.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp


class EllMatrix(NamedTuple):
    indices: jax.Array   # [N, w] column ids, sentinel N on padding
    values: jax.Array    # [N, w] matching values, 0 on padding
    shape: tuple


def to_ell(A: sp.spmatrix, dtype=None) -> EllMatrix:
    A = sp.csr_matrix(A)
    N = A.shape[0]
    counts = np.diff(A.indptr)
    w = max(int(counts.max()), 1)
    idx = np.full((N, w), N, dtype=np.int32)
    val = np.zeros((N, w), dtype=A.dtype if dtype is None else dtype)
    for i in range(N):
        lo, hi = A.indptr[i], A.indptr[i + 1]
        idx[i, : hi - lo] = A.indices[lo:hi]
        val[i, : hi - lo] = A.data[lo:hi]
    return EllMatrix(jnp.asarray(idx), jnp.asarray(val), A.shape)


def ell_matvec(A: EllMatrix, x: jax.Array) -> jax.Array:
    """y = A @ x for x of shape [N] or [N, k] (padded gather + row reduction)."""
    pad_shape = (1,) + x.shape[1:]
    xp = jnp.concatenate([x, jnp.zeros(pad_shape, dtype=x.dtype)], axis=0)
    gathered = xp[A.indices]                      # [N, w, ...]
    if x.ndim == 1:
        return jnp.sum(A.values * gathered, axis=1)
    return jnp.sum(A.values[..., None] * gathered, axis=1)
