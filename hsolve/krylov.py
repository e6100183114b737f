"""Restarted GMRES with right preconditioning.

Capability parity with the reference's Krylov integration
(``IterativeSolvers.gmres(A, b; Pr=F, reltol, restart, maxiter, log)`` at
``/root/reference/test/rungmres.jl:47-48``): restarted GMRES(restart) whose right
preconditioner is applied as a callable (our :class:`hsolve.factor.Factorization`),
with a per-iteration residual-norm history.

Implementation: modified Gram-Schmidt Arnoldi + Givens rotations, so the residual norm
is tracked without extra matvecs.  The O(n) work (matvec, preconditioner, MGS) runs on
device; the O(restart^2) Hessenberg bookkeeping is a host loop on tiny arrays.
"""

from __future__ import annotations

from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _givens(a, b):
    """Complex-safe Givens pair (cs, sn) zeroing b: apply as
    [cs, sn; -conj(sn), cs] @ [a; b] = [r; 0]."""
    denom = np.sqrt(abs(a) ** 2 + abs(b) ** 2)
    if denom == 0.0:
        return 1.0, 0.0 * a
    if abs(a) == 0.0:
        return 0.0, b / abs(b) if abs(b) else 0.0
    cs = abs(a) / denom
    sn = (a * np.conj(b)) / (abs(a) * denom)
    return cs, sn


def gmres(matvec: Callable, b: jax.Array, M: Optional[Callable] = None,
          x0: Optional[jax.Array] = None, reltol: float = 1e-9, abstol: float = 0.0,
          restart: int = 30, maxiter: Optional[int] = None):
    """Solve ``A x = b`` with right-preconditioned restarted GMRES.

    matvec: ``v -> A v``; M: ``v -> M^{-1} v`` (right preconditioner).
    Returns ``(x, info)``: ``info['resnorm']`` holds the initial residual norm followed
    by one entry per inner iteration; ``info['iters']``; ``info['converged']``.
    """
    b = jnp.asarray(b)
    n = b.shape[0]
    if maxiter is None:
        maxiter = restart
    if M is None:
        M = lambda v: v
    x = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    have_x = x0 is not None

    scalar = np.complex128 if jnp.iscomplexobj(b) else np.float64
    bnorm = float(jnp.linalg.norm(b))
    tol = max(reltol * bnorm, abstol)
    history: List[float] = []
    iters = 0
    converged = False

    while iters < maxiter and not converged:
        r = b - matvec(x) if (have_x or iters > 0) else b
        beta = float(jnp.linalg.norm(r))
        if iters == 0:
            history.append(beta)
        if beta <= tol:
            converged = True
            break
        m = min(restart, maxiter - iters)
        V = jnp.zeros((m + 1, n), dtype=b.dtype).at[0].set(r / beta)
        H = np.zeros((m + 1, m), dtype=scalar)
        cs = np.ones(m, dtype=np.float64)
        sn = np.zeros(m, dtype=scalar)
        g = np.zeros(m + 1, dtype=scalar)
        g[0] = beta
        j_done = 0
        for j in range(m):
            w = matvec(M(V[j]))
            w, hcol = _mgs(V, w, j)
            hj = np.asarray(hcol).astype(scalar)
            hnorm = float(jnp.linalg.norm(w))
            H[: j + 1, j] = hj[: j + 1]
            H[j + 1, j] = hnorm
            if hnorm > 0:
                V = V.at[j + 1].set(w / hnorm)
            for i in range(j):  # apply accumulated rotations
                t = cs[i] * H[i, j] + sn[i] * H[i + 1, j]
                H[i + 1, j] = -np.conj(sn[i]) * H[i, j] + cs[i] * H[i + 1, j]
                H[i, j] = t
            cs[j], sn[j] = _givens(H[j, j], H[j + 1, j])
            H[j, j] = cs[j] * H[j, j] + sn[j] * H[j + 1, j]
            H[j + 1, j] = 0.0
            g[j + 1] = -np.conj(sn[j]) * g[j]
            g[j] = cs[j] * g[j]
            j_done = j + 1
            res = abs(g[j + 1])
            history.append(float(res))
            if res <= tol:
                break
        if j_done:
            y = np.linalg.solve(H[:j_done, :j_done], g[:j_done])
            upd = jnp.tensordot(jnp.asarray(y, dtype=b.dtype), V[:j_done], axes=1)
            x = x + M(upd)
            have_x = True
        iters += j_done
        # the Givens estimate drifts when M is applied in lower precision; declare
        # convergence only on the true residual (this also makes restarted cycles act
        # as iterative refinement around a reduced-precision preconditioner)
        true_res = float(jnp.linalg.norm(b - matvec(x)))
        history[-1] = true_res
        converged = bool(true_res <= tol)

    info = {"resnorm": np.asarray(history, dtype=np.float64), "iters": iters,
            "converged": converged}
    return x, info


@jax.jit
def _mgs_step(V, w, mask):
    """Masked modified Gram-Schmidt of w against the rows of V."""
    def body(carry, vm):
        w = carry
        v, mk = vm
        h = jnp.vdot(v, w) * mk
        return w - h * v, h

    w, h = jax.lax.scan(body, w, (V, mask))
    return w, h


def _mgs(V: jax.Array, w: jax.Array, j: int):
    """Orthogonalize w against V[0..j] on device; returns (w_orth, coefficients)."""
    mask = (jnp.arange(V.shape[0]) <= j).astype(jnp.real(w).dtype)
    return _mgs_step(V, w, mask)
