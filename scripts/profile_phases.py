"""Phase-level timing breakdown on the real TPU: factor pieces and solve pieces.

Usage: python scripts/profile_phases.py [--n 128]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def t(fn, reps=20):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    import jax
    from hsolve.utils.profiling import device_sync
    device_sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--k", type=float, default=40.0)
    ap.add_argument("--leafmax", type=int, default=100)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/hsolve_jit_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    import hsolve
    from hsolve.factor import (build_front, factor_with_plan, solve_with_data,
                               traced_numeric_phase, _apply_impl)
    from hsolve.planner import plan_factorization

    A, b, shape = hsolve.helmholtz2d(args.n, k=args.k)
    b = np.asarray(b)
    tree = hsolve.nested_dissection(shape, leafmax=args.leafmax)
    opts = hsolve.SolverOptions(swlevel=0)
    plan = plan_factorization(A, tree, opts)
    print(f"N={plan.N} batches={len(plan.batches)}")
    for i, bp in enumerate(plan.batches):
        print(f"  batch {i}: B={bp.B} ni_pad={bp.ni_pad} nb_pad={bp.nb_pad} "
              f"leaf={bp.is_leaf} nnz={len(bp.front_pos)}")

    fdtype = jnp.float32

    # --- factor phases ---
    dt = t(lambda: [build_front(bp, fdtype) for bp in plan.batches])
    print(f"build_front (all batches): {dt*1e3:.2f} ms")

    fronts = [build_front(bp, fdtype) for bp in plan.batches]
    fused = jax.jit(lambda fr: traced_numeric_phase(plan, fr))
    dt = t(lambda: fused(fronts))
    print(f"fused numeric phase: {dt*1e3:.2f} ms")

    F = factor_with_plan(plan, opts, dtype=fdtype)
    dt = t(lambda: factor_with_plan(plan, opts, dtype=fdtype).levels[-1].lu)
    print(f"factor_with_plan end-to-end (warm): {dt*1e3:.2f} ms")

    # --- solve phases ---
    ell64 = hsolve.to_ell(A, dtype=np.float64)
    ell32 = hsolve.to_ell(A, dtype=np.float32)
    bj64 = jnp.asarray(b, dtype=jnp.float64)
    bj32 = jnp.asarray(b, dtype=jnp.float32)

    mv64 = jax.jit(lambda v: hsolve.ell_matvec(ell64, v))
    mv32 = jax.jit(lambda v: hsolve.ell_matvec(ell32, v))
    dt = t(lambda: mv64(bj64)); print(f"matvec f64: {dt*1e3:.3f} ms")
    dt = t(lambda: mv32(bj32)); print(f"matvec f32: {dt*1e3:.3f} ms")

    sd = F.solve_data
    pre = jax.jit(solve_with_data)
    dt = t(lambda: pre(sd, bj32)); print(f"precond apply f32: {dt*1e3:.3f} ms")
    dt = t(lambda: pre(sd, bj64.astype(jnp.float32))); pass

    # full apply in permuted coords (no perm scatter)
    app = jax.jit(lambda lv, rt, v: _apply_impl(lv, rt, v))
    bp32 = bj32[jnp.asarray(plan.perm)]
    dt = t(lambda: app(F.levels, F.root, bp32))
    print(f"apply_permuted f32: {dt*1e3:.3f} ms")

    # MGS scan cost at m=30, f64 vs f32
    for dtype, tag in ((jnp.float64, "f64"), (jnp.float32, "f32")):
        V = jnp.zeros((31, plan.N), dtype=dtype)
        w0 = jnp.ones((plan.N,), dtype=dtype)
        mask = jnp.ones((31,), dtype=dtype)

        @jax.jit
        def mgs(V, w, mask):
            def body(wc, vm):
                v, mk = vm
                h = jnp.vdot(v, wc) * mk
                return wc - h * v, h
            return jax.lax.scan(body, w, (V, mask))

        dt = t(lambda: mgs(V, w0, mask))
        print(f"MGS scan (31 rows) {tag}: {dt*1e3:.3f} ms")

    # one full gmres solve (current config)
    from bench import _mv, _precond, _FD
    _FD[0] = fdtype

    def run_solve():
        x, info = hsolve.gmres_compiled(
            _mv, _precond, bj64, reltol=1e-9, restart=30, maxiter=60,
            mv_data=ell64, M_data=F.solve_data, m_eps=1e-6)
        return x
    dt = t(run_solve, reps=5)
    print(f"gmres_compiled f64 outer (current): {dt*1e3:.2f} ms")


if __name__ == "__main__":
    main()
