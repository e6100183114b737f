"""Checkpoint / resume for factorizations.

The reference has no persistence at all (SURVEY.md section 5.4 - the factorization
lives only in memory).  Here the factor data is a pytree of arrays, so checkpointing is
a flatten + save: :func:`save_solver` persists everything ``solve`` needs
(levels, root, permutation) and :func:`load_solver` restores a solve-capable handle
without re-planning or re-factorizing.  Orbax works on the same pytree for
production checkpointing; this lightweight path has no extra dependencies.
"""

from __future__ import annotations

import pickle

import jax
import numpy as np


def save_solver(path: str, F) -> None:
    """Persist a Factorization's solve data (levels + root + permutation)."""
    data = F.solve_data
    leaves, treedef = jax.tree_util.tree_flatten(data)
    np_leaves = [np.asarray(x) for x in leaves]
    with open(path, "wb") as f:
        pickle.dump({"treedef": treedef, "leaves": np_leaves, "N": F.N,
                     "version": 1}, f)


class LoadedSolver:
    """Solve-capable handle restored from a checkpoint (matches the
    ``Factorization.solve`` / ``solve_data`` surface)."""

    def __init__(self, N, solve_data):
        self.N = N
        self.solve_data = solve_data

    def solve(self, b):
        from hsolve.factor import solve_with_data
        import jax.numpy as jnp

        return solve_with_data(self.solve_data, jnp.asarray(b))

    ldiv = solve


def load_solver(path: str) -> LoadedSolver:
    with open(path, "rb") as f:
        blob = pickle.load(f)
    leaves = [jax.numpy.asarray(x) for x in blob["leaves"]]
    data = jax.tree_util.tree_unflatten(blob["treedef"], leaves)
    return LoadedSolver(blob["N"], data)
