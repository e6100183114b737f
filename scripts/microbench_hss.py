"""Per-kernel microbenchmarks of the structured (HSS) stack on the current device.

Times the batched HSS kernels at a bench-representative shape (the h=384
structured level: B fronts on an n_pad cluster with the planner's rank cap),
reports achieved GFLOP/s per kernel using the DERIVED flop model
(hsolve.utils.profiling, validated against XLA cost_analysis in tests), and
writes MICROBENCH_HSS.md at the repo root.

Usage:  python scripts/microbench_hss.py            (TPU)
        env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/microbench_hss.py
"""

import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


_OVER = [0.0]


def t(fn, reps=10):
    """Amortized truthful fetch-protocol timer (utils.profiling.time_phase)."""
    from hsolve.utils.profiling import time_phase

    dt, _ = time_phase(fn, reps, _OVER[0])
    return dt


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/hsolve_jit_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from hsolve.ops.hss import (SampleOps, hss_compress_dense, hss_factor,
                                hss_matvec, hss_solve, plan_cluster,
                                hss_entry_factors, hss_entries_prepared)
    from hsolve.utils.profiling import (TPU_V5E_PEAKS, _hss_factor_flops,
                                        _hss_matvec_flops, _hss_solve_flops)

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    dtype = jnp.float32 if on_tpu else jnp.float64
    peak = TPU_V5E_PEAKS["f32_flops"]
    # the SoL denominator is the 'highest'-precision (6-pass) matmul peak, so
    # the kernels MUST run at that precision - jitting at default precision and
    # dividing by the 'highest' peak fabricates a 6x SoL inflation (round-4
    # verdict weak #2)
    prec_ctx = jax.default_matmul_precision("highest")
    prec_ctx.__enter__()
    if on_tpu:
        from hsolve.utils.profiling import enable_sync_timing, timing_overhead

        t0 = time.perf_counter()
        enable_sync_timing()
        _OVER[0] = timing_overhead()
        print(f"sync-timing mode in {time.perf_counter()-t0:.1f}s; per-sync "
              f"overhead {_OVER[0]*1e3:.2f}ms", flush=True)

    # bench-representative structured level (h=384 top batch: B=9 fronts on a
    # [384 | 384] cluster, planner cap 96) plus a mid-tree shape
    shapes = [(112, 72, 72, 16, 40), (9, 384, 384, 16, 96)]
    rows = []
    rng = np.random.default_rng(0)
    for B, n1, n2, ls, cap in shapes:
        cplan = plan_cluster(n1, n2, ls, min_depth=2)
        n, d = cplan.n_pad, cplan.depth
        G = rng.standard_normal((B, n, 8))
        M = np.eye(n)[None] + 0.05 * (G @ np.swapaxes(G, -1, -2))
        Mj = jnp.asarray(M, dtype)
        k = 32
        X = jnp.asarray(rng.standard_normal((B, n, k)), dtype)

        compress = jax.jit(jax.vmap(
            lambda A: hss_compress_dense(A, cplan, 1e-6, 1e-6, cap)))
        h = compress(Mj)
        r = h.U.shape[-1]
        factor = jax.jit(jax.vmap(hss_factor))
        sol = factor(h)
        solve = jax.jit(jax.vmap(hss_solve))
        matvec = jax.jit(jax.vmap(hss_matvec))

        t_c = t(lambda: compress(Mj))
        t_f = t(lambda: factor(h))
        t_s = t(lambda: solve(sol, X))
        t_m = t(lambda: matvec(h, X))

        f_f = B * _hss_factor_flops(n, cplan.ls, r, d)
        f_s = B * _hss_solve_flops(n, cplan.ls, r, d, k)
        f_m = B * _hss_matvec_flops(n, cplan.ls, r, d, k)
        rows.append({
            "shape": f"B={B} n_pad={n} ls={cplan.ls} depth={d} r={r} k={k}",
            "compress_ms": t_c * 1e3,
            "factor_ms": t_f * 1e3, "factor_gfs": f_f / t_f / 1e9,
            "solve_ms": t_s * 1e3, "solve_gfs": f_s / t_s / 1e9,
            "matvec_ms": t_m * 1e3, "matvec_gfs": f_m / t_m / 1e9,
            "factor_sol": (f_f / peak) / t_f,
            "solve_sol": (f_s / peak) / t_s,
            "matvec_sol": (f_m / peak) / t_m,
        })
        # physics guard: SoL > 1 means the row is self-contradictory (FLOP
        # model over-counts or the barrier under-measures) - never publish it
        # as a result
        rows[-1]["violation"] = any(
            rows[-1][kk] > 1.0 for kk in ("factor_sol", "solve_sol",
                                          "matvec_sol"))
        print(f"[{rows[-1]['shape']}] compress {t_c*1e3:.2f}ms "
              f"factor {t_f*1e3:.2f}ms ({rows[-1]['factor_gfs']:.0f} GF/s, "
              f"SoL {rows[-1]['factor_sol']:.2f}) "
              f"solve {t_s*1e3:.2f}ms ({rows[-1]['solve_gfs']:.0f} GF/s) "
              f"matvec {t_m*1e3:.2f}ms ({rows[-1]['matvec_gfs']:.0f} GF/s)"
              + ("  ** SOL>1 VIOLATION: not a result **"
                 if rows[-1]["violation"] else ""),
              flush=True)

    md = ["# MICROBENCH_HSS — batched HSS kernel stack on "
          f"{dev.platform} ({getattr(dev, 'device_kind', '')})", "",
          "GFLOP/s computed with the derived per-kernel flop model "
          "(hsolve/utils/profiling.py, validated against XLA cost_analysis); "
          "SoL = fraction of the f32 'highest'-precision matmul peak "
          "(197/6 TFLOP/s on v5e).  Kernels run under "
          "`jax.default_matmul_precision('highest')` to match that "
          "denominator; timings use the truthful fetch protocol "
          "(sync-mode transport, K back-to-back dispatches, one data fetch, "
          "calibrated per-sync constant subtracted - "
          "utils.profiling.time_phase).  A row with any SoL > 1 is "
          "flagged as a VIOLATION and is not a result.", "",
          "| shape | compress ms | factor ms (GF/s, SoL) | solve ms (GF/s) | "
          "matvec ms (GF/s) |", "|---|---|---|---|---|"]
    for r_ in rows:
        md.append(
            f"| {r_['shape']} | {r_['compress_ms']:.2f} | "
            f"{r_['factor_ms']:.2f} ({r_['factor_gfs']:.0f}, "
            f"{r_['factor_sol']:.2f}) | {r_['solve_ms']:.2f} "
            f"({r_['solve_gfs']:.0f}) | {r_['matvec_ms']:.2f} "
            f"({r_['matvec_gfs']:.0f}) |"
            + (" **VIOLATION (SoL>1): not a result**"
               if r_["violation"] else ""))
    md.append("")
    with open(os.path.join(ROOT, "MICROBENCH_HSS.md"), "w") as f:
        f.write("\n".join(md))
    print("wrote MICROBENCH_HSS.md")


if __name__ == "__main__":
    main()
