"""Round 2 primitive microbenchmarks: amortized (k ops per program) so the
~30 ms axon call+fetch floor divides out.

Run: nohup python tools/profile_prims2.py > /tmp/profile_prims2.txt 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPS = 16


def main():
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    R3 = 256**3

    def timeit(name, fn, *args, n=3):
        f = jax.jit(fn)
        r = f(*args)
        float(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[0])
        ts = []
        for _ in range(n):
            t0 = time.time()
            r = f(*args)
            float(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[0])
            ts.append(time.time() - t0)
        ms = (np.median(ts) * 1000 - 30.0) / REPS  # subtract fetch floor
        print(f"{name:40s} {ms:9.3f} ms/op", flush=True)

    table = jnp.asarray(rng.randint(0, 1 << 20, R3).astype(np.int32))

    # elementwise gather rate vs query count (dependent chain, REPS deep)
    for Q in (1 << 17, 1 << 18, 1 << 20, 1 << 22, 1 << 24):
        q0 = jnp.asarray(rng.randint(0, R3, Q).astype(np.int32))

        def chain(q):
            for _ in range(REPS):
                q = jnp.take(table, q, axis=0) % R3
            return q[0]

        timeit(f"gather_{Q>>10}k_from_67MB", chain, q0)

    # row gather: (G, S) rows, take axis 0
    G, S = 98304, 512
    rows = jnp.asarray(rng.rand(G, S).astype(np.float32))
    gidx0 = jnp.asarray(rng.randint(0, G, 2048).astype(np.int32))

    def rowchain(gi):
        acc = jnp.float32(0)
        for _ in range(REPS):
            got = jnp.take(rows, gi, axis=0)       # (2048, 512)
            acc = acc + got[0, 0]
            gi = (gi + 1) % G
        return acc

    timeit("rowgather_2048x512_from_192MB", rowchain, gidx0)

    gidx1 = jnp.asarray(rng.randint(0, G, 8192).astype(np.int32))
    timeit("rowgather_8192x512", rowchain, gidx1)

    # counting-search: searchsorted(T, q) = sum(T < q) over small table
    Tsmall = jnp.asarray(np.sort(rng.randint(0, 1 << 20, 2048)).astype(np.int32))
    qq = jnp.asarray(rng.randint(0, 1 << 20, 1 << 17).astype(np.int32))

    def csearch(q):
        acc = jnp.int32(0)
        for i in range(REPS):
            r = jnp.sum(
                (Tsmall[None, :] < (q[:, None] + i)).astype(jnp.int32), axis=1
            )
            acc = acc + r[0]
        return acc

    timeit("countsearch_131k_x2048", csearch, qq)

    # block one-hot compaction einsum: (AG,S) vals + local csum -> (AG,PC)
    AG, PC = 2048, 128
    vals = jnp.asarray(rng.rand(AG, S).astype(np.float32))
    mask = jnp.asarray((rng.rand(AG, S) < 0.1))

    def compact(vals, mask):
        acc = jnp.float32(0)
        for i in range(REPS):
            cs = jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1
            oh = (
                (cs[:, None, :] == jnp.arange(PC, dtype=jnp.int32)[None, :, None])
                & mask[:, None, :]
            ).astype(jnp.float32)
            out = jnp.einsum("gps,gs->gp", oh, vals + i)
            acc = acc + out[0, 0]
        return acc

    timeit("onehot_compact_2048x128x512", compact, vals, mask)

    # take_along_axis batched bisection step: (AG, PC) idx into (AG, S)
    idx = jnp.asarray(rng.randint(0, S, (AG, PC)).astype(np.int32))

    def taa(ix):
        acc = jnp.float32(0)
        for _ in range(REPS):
            got = jnp.take_along_axis(vals, ix, axis=1)
            acc = acc + got[0, 0]
            ix = (ix + 1) % S
        return acc

    timeit("take_along_axis_2048x128_of_512", taa, idx)

    # scatter: how near-serial really? 94k rows into 131k slots
    sidx = jnp.asarray(rng.permutation(1 << 17)[: 94000].astype(np.int32))
    svals = jnp.asarray(rng.rand(94000).astype(np.float32))

    def scat(si):
        acc = jnp.float32(0)
        for _ in range(REPS):
            out = jnp.zeros(1 << 17, jnp.float32).at[si].set(svals)
            acc = acc + out[0]
            si = (si + 1) % (1 << 17)
        return acc

    timeit("scatter_94k_into_131k", scat, sidx)

    # one-hot matmul lookup at compacted scale: 1M q from 256-table
    tbl256 = jnp.asarray(rng.randint(0, 6, 256, dtype=np.int32))
    qc = jnp.asarray(rng.randint(0, 256, 1 << 20).astype(np.int32))

    def oh_lookup(q):
        acc = jnp.float32(0)
        t = tbl256.astype(jnp.float32)
        for i in range(REPS):
            qb = ((q + i) % 256).reshape(-1, 128)
            oh = (qb[:, :, None] == jnp.arange(256, dtype=jnp.int32)).astype(
                jnp.bfloat16)
            r = jnp.einsum("abc,c->ab", oh, t.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            acc = acc + r[0, 0]
        return acc

    timeit("onehot_lookup_1M_256", oh_lookup, qc)


if __name__ == "__main__":
    main()
