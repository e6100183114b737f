"""Batched dense kernels (the framework's "native" numerical layer).

The reference reaches LAPACK through Julia's ``/``, ``\\``, ``qr`` on dynamically shaped
matrices (factorization.jl:33-40, blockmatrix.jl:139-142).  Here the same capabilities
are batched, fixed-shape XLA primitives that map onto the TPU MXU:

- :func:`lu_factor` / :func:`lu_solve` / :func:`lu_solve_right`: batched pivoted LU and
  the two-sided triangular solves behind ``D \\ B`` and ``B / D``,
- :func:`schur_complement`: the extend-add Schur update GEMM,
- :func:`permute_sym`: symmetric gather-permutation of a batch of Schur complements into
  ``[int_loc; bnd_loc]`` order (factorization.jl:39-41).

Padding convention: pivot blocks carry an identity diagonal on padded rows/cols (set by
the planner) so LU, solves and Schur updates are exact on the real sub-blocks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def lu_factor(D: jax.Array):
    """Batched pivoted LU: returns (lu, perm) with ``D[..., perm, :] = L @ U``."""
    lu, _, perm = lax.linalg.lu(D)
    return lu, perm


def _take_rows(B: jax.Array, perm: jax.Array) -> jax.Array:
    return jnp.take_along_axis(B, perm[..., :, None], axis=-2)


def lu_solve(lu: jax.Array, perm: jax.Array, B: jax.Array) -> jax.Array:
    """Solve ``D X = B`` given (lu, perm) from :func:`lu_factor` (batched)."""
    Bp = _take_rows(B, perm)
    Y = lax.linalg.triangular_solve(lu, Bp, left_side=True, lower=True,
                                    unit_diagonal=True)
    return lax.linalg.triangular_solve(lu, Y, left_side=True, lower=False)


def lu_solve_right(lu: jax.Array, perm: jax.Array, B: jax.Array) -> jax.Array:
    """Solve ``X D = B`` given (lu, perm) from :func:`lu_factor` (batched).

    With ``P D = L U`` (rows ``perm``), ``X = ((B / U) / L) P``; the final column
    permutation is ``X[..., :, c] = Z[..., :, invperm[c]]``.
    """
    Z = lax.linalg.triangular_solve(lu, B, left_side=False, lower=False)
    Z = lax.linalg.triangular_solve(lu, Z, left_side=False, lower=True,
                                    unit_diagonal=True)
    inv = jnp.argsort(perm, axis=-1)
    return jnp.take_along_axis(Z, inv[..., None, :], axis=-1)


def lu_inverse(lu: jax.Array, perm: jax.Array) -> jax.Array:
    """Explicit ``D^{-1}`` from (lu, perm) (batched).  Solve sweeps then apply the
    pivot block as one GEMM instead of two latency-bound triangular solves."""
    n = lu.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=lu.dtype), lu.shape)
    return lu_solve(lu, perm, eye)


def schur_complement(Abb: jax.Array, Abi: jax.Array, R: jax.Array) -> jax.Array:
    """``S = Abb - Abi @ R`` (batched GEMM; the multifrontal hot loop,
    factorization.jl:40 and :72)."""
    return Abb - Abi @ R


def permute_sym(S: jax.Array, perm: jax.Array) -> jax.Array:
    """Batched symmetric permutation ``S[perm][:, perm]`` (rows+cols gather)."""
    if S.shape[-1] == 0:
        return S
    S = jnp.take_along_axis(S, perm[..., :, None], axis=-2)
    return jnp.take_along_axis(S, perm[..., None, :], axis=-1)
