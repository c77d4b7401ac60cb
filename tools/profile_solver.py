"""Microbenchmark the non-rigid solver's CG matvec constituents on TPU.

Times each primitive of the per-CG-iteration work at bench shapes
(M=4096 nodes, V=32768 verts, k=3) plus candidate replacements, to decide
where the ~1.25 ms/iter goes and what to rebuild. Arrays are passed as jit
arguments (baked constants overflow the axon remote-compile request).

Run: nohup python tools/profile_solver.py > /tmp/profile_solver.txt 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(name, fn, fetch, n=6):
    fetch(fn())
    ts = []
    for _ in range(n):
        t0 = time.time()
        fetch(fn())
        ts.append(time.time() - t0)
    ms = float(np.median(ts) * 1000)
    print(f"{name:36s} {ms:9.3f} ms", flush=True)
    return ms


def main():
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from dynamicfusion_body_tpu.solvers.nonrigid import make_sorted_reducer

    M, V, k = 4096, 32768, 3
    N = V * k
    P = M * k
    S = 32
    rng = np.random.RandomState(0)
    nbr_flat = jnp.asarray(rng.randint(0, M, N).astype(np.int32))
    pair_i = jnp.asarray(np.repeat(np.arange(M, dtype=np.int32), k))
    pair_j = jnp.asarray(rng.randint(0, M, P).astype(np.int32))
    p8 = jnp.asarray(rng.rand(8, M).astype(np.float32))
    pM8 = jnp.asarray(rng.rand(M, 8).astype(np.float32))
    Jd8 = jnp.asarray(rng.rand(8, N).astype(np.float32))
    x64 = jnp.asarray(rng.rand(64, N).astype(np.float32))
    Dinv = jnp.asarray(rng.rand(M, 8, 8).astype(np.float32))
    Hblk = jnp.asarray(rng.rand(M, S, 8, 8).astype(np.float32))
    part = jnp.asarray(rng.randint(0, M, (M, S)).astype(np.int32))
    wN = jnp.asarray(rng.rand(N).astype(np.float32))

    f1 = lambda x: float(jnp.ravel(x)[0])
    hi = jax.lax.Precision.HIGHEST

    # 1. current lane gather (8,M) -> (8,N)
    g_lane = jax.jit(lambda p, ids: jnp.take(p, ids, axis=1))
    timeit("take_lane_(8,M)->(8,N)", lambda: g_lane(p8, nbr_flat), f1)

    # 2. row gather (M,8) -> (N,8) then transpose
    g_row = jax.jit(lambda p, ids: jnp.take(p, ids, axis=0).T)
    timeit("take_row_(M,8)->(N,8)->T", lambda: g_row(pM8, nbr_flat), f1)

    # 3. sorted reducer on (8,N)
    red = make_sorted_reducer(nbr_flat, M)
    red8 = jax.jit(lambda x: red(x))
    timeit("red_nbr_(8,N)", lambda: red8(Jd8), f1)

    # 4. sorted reducer on (64,N) (block-jacobi assembly)
    timeit("red_nbr_(64,N)", lambda: red8(x64), f1)

    # 5. precond einsum
    pc = jax.jit(lambda D, r: jnp.einsum("mab,bm->am", D, r, precision=hi))
    timeit("precond_einsum", lambda: pc(Dinv, p8), f1)

    # 6. full current matvec (data term only)
    def mv(p, ids, J, w):
        pg = jnp.take(p, ids, axis=1)
        prod = jnp.sum(J * pg, axis=0)
        Jp = jnp.sum(prod.reshape(V, k), axis=1)
        JpN = jnp.broadcast_to(Jp[:, None], (V, k)).reshape(N)
        return red(J * (w * JpN)[None, :])

    mvj = jax.jit(mv)
    timeit("matvec_data_current", lambda: mvj(p8, nbr_flat, Jd8, wN), f1)

    # 7. block-Hessian matvec: row-gather partners + einsum
    def mv_blk(Hb, pt, p):
        pg = jnp.take(p, pt.reshape(-1), axis=0).reshape(M, S, 8)
        return jnp.einsum("msab,msb->ma", Hb, pg, precision=hi)

    mvb = jax.jit(mv_blk)
    timeit("matvec_blockH_(M,32,8,8)", lambda: mvb(Hblk, part, pM8), f1)

    # 8. block-Hessian assembly cost proxy: (64, V*k*k) reduce
    NK2 = V * k * k
    x64b = jnp.asarray(rng.rand(64, NK2).astype(np.float32))
    ids2 = jnp.asarray(rng.randint(0, M * S, NK2).astype(np.int32))
    red2 = make_sorted_reducer(ids2, M * S)
    red2j = jax.jit(lambda x: red2(x))
    timeit("assembly_red_(64,VK2)->(64,MS)", lambda: red2j(x64b), f1)

    # 9. cumsum alone at (8,N)
    cs = jax.jit(lambda x: jnp.cumsum(x, axis=1))
    timeit("cumsum_(8,N)", lambda: cs(Jd8), f1)

    # 10. elementwise (8,N) fma
    ew = jax.jit(lambda a, b: a * b + 1.0)
    timeit("elementwise_(8,N)", lambda: ew(Jd8, Jd8), f1)


if __name__ == "__main__":
    main()
