"""Setup-phase breakdown on TPU: transfers vs dispatch vs numeric."""
import os
import sys
import time

import numpy as np

from hsolve.utils.profiling import device_sync

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/hsolve_jit_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp
    import hsolve
    from hsolve.factor import build_front_vals, traced_numeric_phase
    from hsolve.planner import plan_factorization

    A, b, shape = hsolve.helmholtz2d(128, k=40.0)
    tree = hsolve.nested_dissection(shape, leafmax=100)
    opts = hsolve.SolverOptions(swlevel=0)
    plan = plan_factorization(A, tree, opts)
    dtype = jnp.float32

    def t(fn, reps=10):
        out = fn()
        device_sync(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        device_sync(out)
        return (time.perf_counter() - t0) / reps

    # 1. host cast + transfer of vals
    dt = t(lambda: [jnp.asarray(bp.front_vals, dtype=dtype) for bp in plan.batches])
    print(f"vals cast+transfer: {dt*1e3:.2f} ms")

    vals32 = [np.asarray(bp.front_vals, dtype=np.float32) for bp in plan.batches]
    dt = t(lambda: [jnp.asarray(v) for v in vals32])
    print(f"vals transfer (pre-cast): {dt*1e3:.2f} ms")

    pos_list = [jax.device_put(np.asarray(bp.front_pos)) for bp in plan.batches]
    device_sync(pos_list)

    fused = jax.jit(lambda vs, ps: traced_numeric_phase(
        plan, [build_front_vals(bp, v, p)
               for bp, v, p in zip(plan.batches, vs, ps)], opts))
    vlist = [jnp.asarray(v) for v in vals32]
    device_sync(vlist)
    dt = t(lambda: fused(vlist, pos_list))
    print(f"fused jit (vals resident): {dt*1e3:.2f} ms")

    def full():
        vl = [jnp.asarray(bp.front_vals, dtype=dtype) for bp in plan.batches]
        return fused(vl, pos_list)
    dt = t(full)
    print(f"transfer + fused: {dt*1e3:.2f} ms")

    dt = t(lambda: hsolve.factor_with_plan(plan, opts, dtype=dtype))
    print(f"factor_with_plan: {dt*1e3:.2f} ms")

    # without explicit inverse
    opts2 = opts.replace(explicit_inverse=False)
    dt = t(lambda: hsolve.factor_with_plan(plan, opts2, dtype=dtype))
    print(f"factor_with_plan (no dinv): {dt*1e3:.2f} ms")


if __name__ == "__main__":
    main()
