"""Micro-benchmarks of candidate TPU formulations (matvec, front build, scatter)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def t(fn, reps=30):
    from hsolve.utils.profiling import device_sync
    device_sync(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
        device_sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/hsolve_jit_cache")
    import jax.numpy as jnp
    import hsolve

    A, b, shape = hsolve.helmholtz2d(128, k=40.0)
    N = A.shape[0]
    b = np.asarray(b)

    # --- matvec variants ---
    Ad = A.todia()
    offs = np.asarray(Ad.offsets)
    print(f"N={N} nnz={A.nnz} ndiags={len(offs)}")
    M = int(np.abs(offs).max())
    # vals[d, i] = A[i, i + offs[d]]
    vals = np.zeros((len(offs), N))
    for k, d in enumerate(offs):
        diag = A.diagonal(d)
        if d >= 0:
            vals[k, : N - d] = diag
        else:
            vals[k, -d:] = diag

    for dt_, tag in ((jnp.float64, "f64"), (jnp.float32, "f32")):
        vj = jnp.asarray(vals, dtype=dt_)
        xj = jnp.asarray(b, dtype=dt_)
        offs_j = [int(d) for d in offs]

        @jax.jit
        def dia_mv(v):
            xp = jnp.pad(v, (M, M))
            acc = jnp.zeros_like(v)
            for k2, d in enumerate(offs_j):
                acc = acc + vj[k2] * jax.lax.dynamic_slice(xp, (M + d,), (N,))
            return acc

        ell = hsolve.to_ell(A, dtype=np.float64 if tag == "f64" else np.float32)
        mv_ell = jax.jit(lambda v: hsolve.ell_matvec(ell, v))
        y1, y2 = np.asarray(dia_mv(xj)), np.asarray(mv_ell(xj))
        err = np.linalg.norm(y1 - y2) / np.linalg.norm(y2)
        print(f"matvec {tag}: ELL {t(lambda: mv_ell(xj))*1e3:.3f} ms, "
              f"DIA {t(lambda: dia_mv(xj))*1e3:.3f} ms (agree {err:.1e})")

    # --- front build variants (leaf batch of the h128 plan) ---
    from hsolve.planner import plan_factorization
    tree = hsolve.nested_dissection(shape, leafmax=100)
    opts = hsolve.SolverOptions(swlevel=0)
    plan = plan_factorization(A, tree, opts)
    bp = plan.batches[0]
    B, m = bp.B, bp.m_pad
    nnz = len(bp.front_pos)
    print(f"leaf batch: B={B} m={m} nnz={nnz} dense={B*m*m}")

    pos = jnp.asarray(bp.front_pos)
    vals_j = jnp.asarray(bp.front_vals, dtype=jnp.float32)

    @jax.jit
    def scatter_build(v):
        flat = jnp.zeros((B * m * m,), dtype=v.dtype)
        return flat.at[pos].set(v, indices_are_sorted=True, unique_indices=True,
                                mode="promise_in_bounds").reshape(B, m, m)

    inv = np.zeros(B * m * m, dtype=np.int32)
    inv[bp.front_pos] = np.arange(1, nnz + 1, dtype=np.int32)
    inv_j = jnp.asarray(inv.reshape(B, m, m))

    @jax.jit
    def gather_build(v):
        vp = jnp.concatenate([jnp.zeros((1,), v.dtype), v])
        return jnp.take(vp, inv_j, axis=0, mode="clip")

    y1 = np.asarray(scatter_build(vals_j))
    y2 = np.asarray(gather_build(vals_j))
    print(f"  agree: {np.abs(y1-y2).max():.1e}")
    print(f"  scatter_build: {t(lambda: scatter_build(vals_j))*1e3:.3f} ms")
    print(f"  gather_build:  {t(lambda: gather_build(vals_j))*1e3:.3f} ms")

    host_buf = np.zeros((B, m, m), dtype=np.float32)

    def host_build():
        host_buf.reshape(-1)[bp.front_pos] = bp.front_vals
        return jax.device_put(host_buf)
    print(f"  host_build+put: {t(host_build, reps=10)*1e3:.3f} ms")

    # --- solve-sweep scatter-add vs segment-sum ---
    lev_bnd = jnp.asarray(plan.batches[0].bnd_ids.astype(np.int32))
    Bl, nbp = lev_bnd.shape
    y = jnp.ones((Bl, nbp, 1), dtype=jnp.float32)
    C0 = jnp.zeros((N + 1, 1), dtype=jnp.float32)

    @jax.jit
    def scat_add(C, y):
        return C.at[lev_bnd].add(-y, mode="drop")

    flat_ids = np.asarray(bp.bnd_ids, dtype=np.int64).ravel()
    order = np.argsort(flat_ids, kind="stable")
    sids = jnp.asarray(flat_ids[order].astype(np.int32))
    order_j = jnp.asarray(order.astype(np.int32))

    @jax.jit
    def seg_add(C, y):
        yf = y.reshape(-1, y.shape[-1])[order_j]
        s = jax.ops.segment_sum(yf, sids, num_segments=N + 1,
                                indices_are_sorted=True)
        return C - s

    y1 = np.asarray(scat_add(C0, y))
    y2 = np.asarray(seg_add(C0, y))
    print(f"sweep scatter-add: agree {np.abs(y1-y2).max():.1e}")
    print(f"  at[].add:    {t(lambda: scat_add(C0, y))*1e3:.3f} ms")
    print(f"  segment_sum: {t(lambda: seg_add(C0, y))*1e3:.3f} ms")

    # --- TRSM vs explicit inverse apply ---
    from hsolve.ops import dense as dk
    D = jnp.asarray(np.random.rand(Bl, 104, 104).astype(np.float32)) + \
        104 * jnp.eye(104, dtype=jnp.float32)
    lu, perm = dk.lu_factor(D)
    lu, perm = jax.block_until_ready((lu, perm))
    x = jnp.ones((Bl, 104, 1), dtype=jnp.float32)
    trs = jax.jit(lambda x: dk.lu_solve(lu, perm, x))
    Dinv = jax.block_until_ready(dk.lu_solve(lu, perm,
                                             jnp.eye(104, dtype=jnp.float32)[None]
                                             * jnp.ones((Bl, 1, 1), jnp.float32)))
    gem = jax.jit(lambda x: Dinv @ x)
    y1, y2 = np.asarray(trs(x)), np.asarray(gem(x))
    print(f"apply: agree {np.abs(y1-y2).max():.1e}")
    print(f"  TRSM pair: {t(lambda: trs(x))*1e3:.3f} ms")
    print(f"  Dinv GEMM: {t(lambda: gem(x))*1e3:.3f} ms")

    # --- CGS2 vs MGS-scan orthogonalization f32 ---
    V = jnp.zeros((31, N), dtype=jnp.float32)
    w0 = jnp.ones((N,), dtype=jnp.float32)
    mask = jnp.ones((31,), dtype=jnp.float32)

    @jax.jit
    def mgs(w):
        def body(wc, vm):
            v, mk = vm
            h = jnp.vdot(v, wc) * mk
            return wc - h * v, h
        return jax.lax.scan(body, w, (V, mask))

    @jax.jit
    def cgs2(w):
        h1 = (V @ w) * mask
        w = w - V.T @ h1
        h2 = (V @ w) * mask
        w = w - V.T @ h2
        return w, h1 + h2

    print(f"orth f32: MGS scan {t(lambda: mgs(w0))*1e3:.3f} ms, "
          f"CGS2 {t(lambda: cgs2(w0))*1e3:.3f} ms")


if __name__ == "__main__":
    main()
