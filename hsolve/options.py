"""Solver options.

Capability parity with the reference options struct
(``/root/reference/src/HierarchicalSolvers.jl:30-79``): the nine reference fields
(``swlevel, swsize, atol, rtol, c_tol, leafsize, kest, stepsize, verbose``) keep their
names, defaults and validation semantics.  TPU-native extensions control static-shape
planning (padding granularity, rank caps) which have no counterpart in the reference's
dynamically-shaped Julia code.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass
class SolverOptions:
    # --- reference-parity fields (defaults: HierarchicalSolvers.jl:43-59) ---
    swlevel: int = 5          # switching level at which to start compression
    swsize: int = 1           # minimum boundary size for compression
    atol: float = 1e-6        # absolute compression tolerance
    rtol: float = 1e-6        # relative compression tolerance
    c_tol: float = 0.5        # low-rank tol relative to HSS tol (ref declares but hard-codes 0.5)
    leafsize: int = 32        # HSS leaf size
    kest: int = -1            # initial rank estimate for randomized HSS sampling
    stepsize: int = 10        # rank-growth step for adaptive sampling
    verbose: bool = False

    # --- TPU-native extensions (static-shape planning) ---
    pad: int = 8              # pad front dims (ni, nb) up to multiples of this
    rank_cap: int = 0         # static max rank for low-rank/HSS blocks (0 = planner
                              # decides: from kest when kest > 0 - the reference's
                              # user-provided rank estimate (factorization.jl:102-104,
                              # rungmres.jl:21 kest=200) - else boundary/4)
    rank_pad: int = 8         # pad ranks up to multiples of this
    # Per-tree-level rank caps, indexed by reference recursion level (root = 1,
    # level_caps[0] caps the root level; the LAST entry extends to all deeper
    # levels).  Overrides rank_cap/kest where set.  Separator interaction ranks
    # fall quickly below the top levels, and every structured-kernel shape
    # scales with cap^2 - calibrate with scripts/rankcal.py (the per-problem
    # analog of the reference's kest knob, rungmres.jl:21).
    level_caps: Optional[tuple] = None
    dtype: Optional[str] = None  # "float32" | "float64" | "complex64" | "complex128" | None (infer)
    # TPU matmuls default to bfloat16 passes; "highest" keeps f32 kernels at full
    # f32 accuracy (required for exact-mode parity), "default" trades accuracy for
    # ~3-6x MXU throughput (fine for loose-tolerance preconditioners).
    matmul_precision: str = "highest"
    # Matmul precision for the STRUCTURED (HSS) kernels only; None inherits
    # matmul_precision.  "high" (3-pass bf16, ~1e-6 element error) doubles MXU
    # throughput of the compressed path and sits well below compression
    # tolerances >= 1e-4; the exact/dense path keeps matmul_precision.
    structured_precision: Optional[str] = None
    seed: int = 123           # PRNG seed for randomized compression (rungmres.jl:7)
    hss: bool = True          # emit HSS Schur complements on compressed levels
                              # (False = low-rank Gauss transforms only, dense S)
    explicit_inverse: Optional[bool] = None  # additionally store D^{-1} (and the root
                              # inverse) so every solve sweep is a GEMM instead of a
                              # pair of triangular solves (~2.4x faster on TPU, where
                              # TRSM is a latency-bound blocked loop); trades 2x
                              # pivot-block memory and backward stability (forward
                              # error ~cond(D)*eps per level).  None = auto: on for
                              # TPU backends, off elsewhere (CPU/f64 runs keep
                              # reference-parity triangular solves).  Guard:
                              # Factorization.cond_report() flags levels whose
                              # pivot growth approaches 1/eps - set False there.
    fast_inverse: Optional[bool] = None  # compute D^{-1} by recursive
                              # block-Schur inversion (pivoting confined to
                              # base diagonal blocks) instead of full pivoted
                              # LU + triangular solves.  The LU/TRSM loops are
                              # O(n) sequential full-width steps and dominate
                              # the factor phase on TPU; block inversion is
                              # O(n/base) base LUs + O(log) GEMMs.  Only takes
                              # effect with explicit_inverse.  None = auto: on
                              # for TPU, off elsewhere.
    adaptive: bool = False    # after a compressed factorization, check the computed
                              # interpolation ranks against the planned caps and
                              # re-factor with doubled caps on saturation (host-loop
                              # parity with randcompress_adaptive,
                              # factorization.jl:110).  Costs one small device->host
                              # fetch per factorization.

    def replace(self, **kwargs) -> "SolverOptions":
        """Kwarg-override copy (parity with ``copy(opts; args...)``,
        HierarchicalSolvers.jl:62-71)."""
        return dataclasses.replace(self, **kwargs)

    def validate(self) -> None:
        """Parity with ``chkopts!`` (HierarchicalSolvers.jl:73-79)."""
        if self.swsize < 1:
            raise ValueError("swsize must be >= 1")
        if self.atol < 0.0:
            raise ValueError("atol must be >= 0")
        if self.rtol < 0.0:
            raise ValueError("rtol must be >= 0")
        if not (0.0 < self.c_tol <= 1.0):
            raise ValueError("c_tol must be in (0, 1]")
        if self.leafsize < 1:
            raise ValueError("leafsize must be >= 1")
        if self.pad < 1:
            raise ValueError("pad must be >= 1")

    def resolve_explicit_inverse(self) -> bool:
        """None = auto: explicit pivot-block inverses only where TRSM latency
        dominates (TPU); CPU keeps backward-stable triangular solves."""
        if self.explicit_inverse is None:
            import jax
            return jax.default_backend() == "tpu"
        return self.explicit_inverse

    def resolve_fast_inverse(self) -> bool:
        """None = off.  Explicit opt-in for now: the kernel is CPU-validated
        (identical GMRES iteration counts at h=128/512; h=512 f32 even
        improves, 16 vs 23-26 iters) and ran clean inside the h=128 TPU
        bench, but the h=512 program triggered a TPU-worker crash on the
        remote-attached link in this environment ("kernel fault"); until
        that is isolated the default numeric path keeps the battle-tested
        pivoted-LU kernels."""
        if not self.explicit_inverse:
            return False
        return bool(self.fast_inverse)

    def resolve_swlevel(self, tree_depth: int) -> int:
        """Negative swlevel counts from the bottom: ``max(depth + swlevel, 0)``
        (parity with factorization.jl:8)."""
        if self.swlevel < 0:
            return max(tree_depth + self.swlevel, 0)
        return self.swlevel
