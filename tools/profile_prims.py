"""Primitive-cost microbenchmarks on the real TPU (v5e via axon).

Measures the raw primitives MC/solver kernels are built from, so designs
target measured costs, not guesses.

Run: nohup python tools/profile_prims.py > /tmp/profile_prims.txt 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    R = 256
    vol = jnp.asarray(rng.rand(R, R, R).astype(np.float32))
    case_flat = jnp.asarray(
        rng.randint(0, 256, R * R * R, dtype=np.int32)
    )
    tbl256 = jnp.asarray(rng.randint(0, 6, 256, dtype=np.int32))
    big_csum = jnp.asarray(np.sort(rng.randint(0, 1 << 30, R**3)).astype(np.int32))
    q262k = jnp.asarray(rng.randint(0, R**3, 1 << 18).astype(np.int32))
    q16m = jnp.asarray(rng.randint(0, 256, R**3).astype(np.int32))
    small_tbl = jnp.asarray(np.sort(rng.randint(0, 1 << 30, 32768)).astype(np.int32))

    def timeit(name, fn, *args, n=4):
        f = jax.jit(fn)
        r = f(*args)
        float(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[0])
        ts = []
        for _ in range(n):
            t0 = time.time()
            r = f(*args)
            float(jnp.ravel(jax.tree_util.tree_leaves(r)[0])[0])
            ts.append(time.time() - t0)
        print(f"{name:36s} {np.median(ts)*1000:9.2f} ms", flush=True)

    # 1. shifted-slice cost by axis
    timeit("slice_x_shift(255^3 sum)", lambda v: v[1:, :, :].sum(), vol)
    timeit("slice_y_shift", lambda v: v[:, 1:, :].sum(), vol)
    timeit("slice_z_shift", lambda v: v[:, :, 1:].sum(), vol)
    timeit("slice_xyz_shift", lambda v: v[1:, 1:, 1:].sum(), vol)

    # 2. the 8-corner case build
    def build_case(v):
        inside = v < 0.5
        c = R - 1
        case = jnp.zeros((c, c, c), jnp.int32)
        for b in range(8):
            dx, dy, dz = b & 1, (b >> 1) & 1, (b >> 2) & 1
            case = case | (
                inside[dx:dx + c, dy:dy + c, dz:dz + c].astype(jnp.int32) << b)
        return case.sum()
    timeit("case_build_8corners", build_case, vol)

    # 3. gathers: query count vs table size
    timeit("gather_16.7M_from_256tbl", lambda q: jnp.take(tbl256, q, axis=0).sum(), q16m)
    timeit("gather_16.7M_from_67MB", lambda q: jnp.take(big_csum, q % (R**3), axis=0).sum(), q16m)
    timeit("gather_262k_from_67MB", lambda q: jnp.take(big_csum, q, axis=0).sum(), q262k)
    timeit("gather_262k_from_128KB", lambda q: jnp.take(small_tbl, q % 32768, axis=0).sum(), q262k)
    q1m = jnp.asarray(rng.randint(0, R**3, 1 << 20).astype(np.int32))
    timeit("gather_1M_from_67MB", lambda q: jnp.take(big_csum, q, axis=0).sum(), q1m)

    # 4. one-hot matmul lookup alternative: (16.7M,256)bf16 @ (256,)
    def onehot_lookup(q):
        qb = q.reshape(-1, 128)  # (131072, 128)
        oh = (qb[:, :, None] == jnp.arange(256, dtype=jnp.int32)).astype(jnp.bfloat16)
        t = tbl256.astype(jnp.bfloat16)
        return jnp.einsum("abc,c->ab", oh, t,
                          preferred_element_type=jnp.float32).sum()
    timeit("onehot_lookup_16.7M_256", onehot_lookup, q16m)

    # 5. cumsums
    timeit("cumsum_16.7M_i32", lambda v: jnp.cumsum(v).sum(), q16m)
    mask50 = jnp.asarray(rng.rand(3 * R**3) < 0.01)
    timeit("cumsum_50M_bool", lambda m: jnp.cumsum(m.astype(jnp.int32))[-1], mask50)

    # 6. sort
    seg = jnp.asarray(rng.randint(0, 4096, 1 << 17).astype(np.int32))
    timeit("sort_131k_i32", lambda s: jnp.sort(s)[0], seg)
    timeit("argsort_131k_i32", lambda s: jnp.argsort(s)[0], seg)

    # 7. bool reduce per brick (32768,512)
    def brickreduce(v):
        t = (v < 0.5).reshape(32, 8, 32, 8, 32, 8)
        return t.transpose(0, 2, 4, 1, 3, 5).reshape(32768, 512).sum(axis=1).sum()
    timeit("brick_transpose_reduce", brickreduce, vol)

    # 8. pad + concat (the mask+t structure)
    def padconcat(v):
        outs = []
        for a in range(3):
            pad = [(0, 0)] * 3
            pad[a] = (0, 1)
            sl = [slice(None)] * 3
            sl[a] = slice(0, R - 1)
            x = v[tuple(sl)] * 2.0
            outs.append(jnp.pad(x, pad).reshape(-1))
        return jnp.concatenate(outs).sum()
    timeit("padconcat_3x67MB", padconcat, vol)


if __name__ == "__main__":
    main()
