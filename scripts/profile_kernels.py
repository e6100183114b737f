"""Kernel-level dissection of the exact factor program at bench shapes:
times each primitive (LU, TRSM, inverse, Schur GEMM, extend-add gather,
COO scatter) separately at every batch shape of the plan, with the truthful
fetch protocol.  The gap between the sum of parts and the fused program is
fusion benefit / launch overhead.

Usage: python scripts/profile_kernels.py [--n 128]
"""

import argparse
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--k", type=float, default=40.0)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/hsolve_jit_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    import hsolve
    from hsolve.factor import build_front, traced_numeric_phase
    from hsolve.ops import dense as dk
    from hsolve.planner import plan_factorization
    from hsolve.utils.profiling import (enable_sync_timing, time_phase,
                                        timing_overhead)

    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu:
        t0 = time.perf_counter()
        enable_sync_timing()
        print(f"sync mode in {time.perf_counter()-t0:.1f}s", flush=True)
    over = timing_overhead() if on_tpu else 0.0
    print(f"per-sync overhead {over*1e3:.2f}ms", flush=True)

    def t(fn, reps=args.reps):
        dt, _ = time_phase(fn, reps, over)
        return dt

    A, b, shape = hsolve.helmholtz2d(args.n, k=args.k)
    tree = hsolve.nested_dissection(shape, leafmax=100)
    opts = hsolve.SolverOptions(swlevel=0)
    opts = opts.replace(explicit_inverse=opts.resolve_explicit_inverse())
    plan = plan_factorization(A, tree, opts)
    fdtype = jnp.float32 if on_tpu else jnp.float64

    with jax.default_matmul_precision(opts.matmul_precision):
        fronts = [build_front(bp, fdtype) for bp in plan.batches]
        jax.block_until_ready(fronts)

        fused = jax.jit(lambda fr: traced_numeric_phase(plan, fr, opts))
        dt_fused = t(lambda: fused(fronts))
        print(f"fused numeric phase: {dt_fused*1e3:.2f} ms", flush=True)

        total_parts = 0.0
        rows = []
        lu_j = jax.jit(dk.lu_factor)
        luslv_j = jax.jit(dk.lu_solve)
        luinv_j = jax.jit(dk.lu_inverse)

        for i, bp in enumerate(plan.batches):
            B, ni, nb = bp.B, bp.ni_pad, bp.nb_pad
            fr = fronts[i]
            D = fr[:, :ni, :ni] + 0.0
            Aib = fr[:, :ni, ni:] + 0.0
            Abi = fr[:, ni:, :ni] + 0.0
            Abb = fr[:, ni:, ni:] + 0.0
            jax.block_until_ready((D, Aib, Abi, Abb))
            t_lu = t(lambda: lu_j(D))
            lu, perm = lu_j(D)
            t_tr = t(lambda: luslv_j(lu, perm, Aib)) if nb else 0.0
            R = luslv_j(lu, perm, Aib) if nb else None
            t_inv = t(lambda: luinv_j(lu, perm))
            t_sc = t(lambda: Abb - Abi @ R) if nb else 0.0
            parts = t_lu + 2 * t_tr + t_inv + t_sc
            total_parts += parts
            rows.append((i, B, ni, nb, t_lu, t_tr, t_inv, t_sc))
            print(f"batch {i:2d} B={B:5d} ni={ni:4d} nb={nb:4d}: "
                  f"lu={t_lu*1e3:6.2f} trsm={t_tr*1e3:6.2f} "
                  f"inv={t_inv*1e3:6.2f} schur={t_sc*1e3:6.2f} ms", flush=True)
        print(f"sum of isolated parts (lu+2trsm+inv+schur): "
              f"{total_parts*1e3:.2f} ms vs fused {dt_fused*1e3:.2f} ms")


if __name__ == "__main__":
    main()
