"""Microbenchmark the non-rigid solver's CG matvec constituents on TPU.

Per-dispatch + host-fetch overhead over the axon tunnel is ~30 ms — far
above the primitives measured here — so each primitive is looped REPS
times inside one jitted program with a data dependency between
iterations, and the reported time is (total - overhead) / REPS.

Run: nohup python tools/profile_solver.py > /tmp/profile_solver.txt 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPS = 64


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

    hi = jax.lax.Precision.HIGHEST
    red = make_sorted_reducer(nbr_flat, M)

    def timeit(name, make_body, init, n=3):
        """make_body: carry -> carry (one primitive application, with a
        data dependency through carry)."""
        body = make_body

        @jax.jit
        def loop(c):
            return jax.lax.fori_loop(0, REPS, lambda i, c: body(c), c)

        out = loop(init)
        _ = float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
        ts = []
        for _i in range(n):
            t0 = time.time()
            out = loop(init)
            _ = float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
            ts.append(time.time() - t0)
        ms = (np.median(ts) * 1000 - 32.0) / REPS  # subtract dispatch+fetch
        print(f"{name:36s} {ms:9.4f} ms/op", flush=True)

    # perturb-carry helpers keep a dependency without changing shapes
    timeit("elementwise_(8,N)",
           lambda c: c * 1.000001 + 0.001, Jd8)
    timeit("cumsum_(8,N)",
           lambda c: jnp.cumsum(c, axis=1) * 1e-6, Jd8)
    timeit("take_lane_(8,M)->(8,N)_sum",
           lambda c: c + 1e-9 * jnp.sum(
               jnp.take(c, nbr_flat % M, axis=1), axis=1, keepdims=True),
           p8)
    timeit("take_row_(M,8)->(N,8)_sum",
           lambda c: c + 1e-9 * jnp.sum(
               jnp.take(c, nbr_flat % M, axis=0), axis=0, keepdims=True),
           pM8)
    timeit("red_nbr_(8,N)",
           lambda c: c + 1e-9 * jnp.sum(red(c + 1.0)) , Jd8)
    timeit("red_nbr_(64,N)",
           lambda c: c + 1e-9 * jnp.sum(red(c + 1.0)), x64)
    timeit("precond_einsum",
           lambda c: jnp.einsum("mab,bm->am", Dinv, c, precision=hi) * 1e-3
           + c * 0.5,
           p8)

    def mv(p):
        pg = jnp.take(p, nbr_flat, axis=1)
        prod = jnp.sum(Jd8 * pg, axis=0)
        Jp = jnp.sum(prod.reshape(V, k), axis=1)
        JpN = jnp.broadcast_to(Jp[:, None], (V, k)).reshape(N)
        return red(Jd8 * (wN * JpN)[None, :])

    timeit("matvec_data_current",
           lambda c: c * 0.5 + 1e-9 * mv(c), p8)

    def mv_blk(p):
        pg = jnp.take(p, part.reshape(-1), axis=0).reshape(M, S, 8)
        return jnp.einsum("msab,msb->ma", Hblk, pg, precision=hi)

    timeit("matvec_blockH_(M,32,8,8)",
           lambda c: c * 0.5 + 1e-9 * mv_blk(c), pM8)

    NK2 = V * k * k
    x64b = jnp.asarray(rng.rand(64, NK2).astype(np.float32))
    ids2 = jnp.asarray(rng.randint(0, M * S, NK2).astype(np.int32))
    red2 = make_sorted_reducer(ids2, M * S)
    timeit("assembly_red_(64,VK2)->(64,MS)",
           lambda c: c + 1e-9 * jnp.sum(red2(c + 1.0)), x64b,
           )


if __name__ == "__main__":
    main()
