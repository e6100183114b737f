"""Pallas TPU kernel: batched blocked LU with partial pivoting.

The framework's hottest dense kernel is the batched pivot-block factorization (the
reference reaches LAPACK getrf via ``\\``, factorization.jl:36-37).  XLA's
``LuDecomposition`` expander runs an unblocked while-loop; this kernel runs one front
per grid program, keeps the front VMEM-resident, and factors right-looking:

- panel (width ``bs``): sequential Businger-Golub steps on an [n, bs] slice (pivot
  search = masked argmax, swaps restricted to the panel, rank-1 updates on the slice),
- pivot swaps are then replayed on the out-of-panel columns,
- ``U12`` by forward substitution on the [bs, n] row slice,
- trailing update as one masked MXU matmul per panel.

Per-front cost: O(n bs) VPU per panel step, O(n^2 bs) MXU per panel - the n^3 bulk
rides the MXU instead of XLA's scalar loop.  Shapes static; padded rows carry the
planner's identity diagonal and factor trivially.  Fronts must fit VMEM (n <= ~1024
in f32); bigger fronts should fall back to ``lax.linalg.lu``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lu_kernel(a_ref, out_ref, piv_ref, *, n: int, bs: int):
    A = a_ref[0]                                   # [n, n]
    nblk = n // bs
    rows_i = lax.broadcasted_iota(jnp.int32, (n, 1), 0)    # [n, 1]
    cols_i = lax.broadcasted_iota(jnp.int32, (1, n), 1)    # [1, n]
    prow_i = lax.broadcasted_iota(jnp.int32, (bs, 1), 0)   # [bs, 1] local rows
    pcol_i = lax.broadcasted_iota(jnp.int32, (1, bs), 1)   # [1, bs] local cols
    piv0 = rows_i[:, 0]

    def block_step(kb, carry):
        A, piv = carry
        j0 = kb * bs

        # --- panel factorization on the [n, bs] slice ---
        panel = lax.dynamic_slice(A, (0, j0), (n, bs))
        parr0 = jnp.zeros((bs, 1), dtype=jnp.int32)

        def pstep(t, c):
            panel, parr = c
            j = j0 + t
            col = lax.dynamic_slice(panel, (0, t), (n, 1))        # [n, 1]
            cand = jnp.where(rows_i >= j, jnp.abs(col), -jnp.inf)
            p = jnp.argmax(cand[:, 0]).astype(jnp.int32)
            parr = lax.dynamic_update_slice(parr, p.reshape(1, 1), (t, 0))
            # swap panel rows j <-> p
            rj = lax.dynamic_slice(panel, (j, 0), (1, bs))
            rp = lax.dynamic_slice(panel, (p, jnp.int32(0)), (1, bs))
            panel = lax.dynamic_update_slice(panel, rp, (j, 0))
            panel = lax.dynamic_update_slice(panel, rj, (p, jnp.int32(0)))
            # multipliers
            pivval = lax.dynamic_slice(panel, (j, t), (1, 1))[0, 0]
            inv = jnp.where(jnp.abs(pivval) > 0, 1.0 / pivval, 0.0)
            col = lax.dynamic_slice(panel, (0, t), (n, 1))
            mult = jnp.where(rows_i > j, col * inv, 0.0)          # [n, 1]
            newcol = jnp.where(rows_i > j, mult, col)
            panel = lax.dynamic_update_slice(panel, newcol, (0, t))
            # rank-1 update of the remaining panel columns
            urow = lax.dynamic_slice(panel, (j, 0), (1, bs))      # [1, bs]
            urow = jnp.where(pcol_i > t, urow, 0.0)
            return panel - mult * urow, parr

        panel, parr = lax.fori_loop(0, bs, pstep, (panel, parr0))
        A = lax.dynamic_update_slice(A, panel, (0, j0))

        # --- replay the panel's row swaps on out-of-panel columns + bookkeeping ---
        outside = (cols_i < j0) | (cols_i >= j0 + bs)             # [1, n]

        def sstep(t, c):
            A, piv = c
            j = j0 + t
            p = lax.dynamic_slice(parr, (t, 0), (1, 1))[0, 0]
            rj = lax.dynamic_slice(A, (j, 0), (1, n))
            rp = lax.dynamic_slice(A, (p, jnp.int32(0)), (1, n))
            A = lax.dynamic_update_slice(A, jnp.where(outside, rp, rj), (j, 0))
            A = lax.dynamic_update_slice(A, jnp.where(outside, rj, rp), (p, jnp.int32(0)))
            pj = lax.dynamic_slice(piv, (j, 0), (1, 1))
            pp = lax.dynamic_slice(piv, (p, jnp.int32(0)), (1, 1))
            piv = lax.dynamic_update_slice(piv, pp, (j, 0))
            piv = lax.dynamic_update_slice(piv, pj, (p, jnp.int32(0)))
            return A, piv

        piv2 = piv.reshape(n, 1)
        A, piv2 = lax.fori_loop(0, bs, sstep, (A, piv2))
        piv = piv2[:, 0]

        # --- U12 by forward substitution on the [bs, n] row slice ---
        rows = lax.dynamic_slice(A, (j0, 0), (bs, n))

        def ustep(t, rows):
            lcol = lax.dynamic_slice(rows, (0, j0 + t), (bs, 1))  # [bs, 1]
            mult = jnp.where(prow_i > t, lcol, 0.0)
            urow = lax.dynamic_slice(rows, (t, 0), (1, n))
            urow = jnp.where(cols_i >= j0 + bs, urow, 0.0)
            return rows - mult * urow

        rows = lax.fori_loop(0, bs, ustep, rows)
        A = lax.dynamic_update_slice(A, rows, (j0, 0))

        # --- trailing MXU update: A -= L21 @ U12 (masked full-width) ---
        Lblk = lax.dynamic_slice(A, (0, j0), (n, bs))
        Lblk = jnp.where(rows_i >= j0 + bs, Lblk, 0.0)
        Ublk = jnp.where(cols_i >= j0 + bs, rows, 0.0)
        A = A - jnp.dot(Lblk, Ublk, preferred_element_type=A.dtype)
        return A, piv

    A, piv = lax.fori_loop(0, nblk, block_step, (A, piv0))
    out_ref[0] = A
    piv_ref[0] = piv


@partial(jax.jit, static_argnames=("bs", "interpret"))
def pallas_lu(D: jax.Array, bs: int = 128, interpret: bool = False):
    """Batched LU with partial pivoting: D [B, n, n] -> (lu [B, n, n], perm [B, n])
    with ``D[b][perm[b], :] = L @ U`` (same contract as ``ops.dense.lu_factor``)."""
    B, n, _ = D.shape
    bs = min(bs, n)
    if n % bs != 0:
        raise ValueError(f"n={n} must be a multiple of the panel size {bs}")
    kern = partial(_lu_kernel, n=n, bs=bs)
    lu, piv = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, n, n), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, n, n), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, n), lambda b: (b, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((B, n, n), D.dtype),
                   jax.ShapeDtypeStruct((B, n), jnp.int32)),
        interpret=interpret,
    )(D)
    return lu, piv
