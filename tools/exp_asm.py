"""Round-4 experiment: layouts for the block-ELL JtWJ assembly reduce.

The assembly reduce (64, T) -> (64, M*D) is the most expensive per-GN-step
operation (docs/tpu_kernel_notes.md). Hypothesis: its cost is the
LANE-AXIS column gather + lane-axis cumsum of the (64, T) channel-major
layout — the same class of tax the marching-cubes notes measured
(elementwise/lane gathers ~9 ns/elem vs row gathers at HBM speed).
Variants measured here, at bench scale (M=4096, V=32768, k=3, T=344k):

  A. current reduce_ell on (64, T) (order gather + cumsum on lanes)
  B. transpose once to (T, 64), then ROW gather + axis-0 cumsum +
     boundary row-gathers (output (M*D, 64) also saves the downstream
     blocks64.T)
  C. as B but contributions BUILT directly in (T, 64) rows
     ((V,8,1)*(V,1,8) -> reshape (V,64); risks the (8,128)-tile pad)
  D. as B in bf16 hi/lo (two passes, halved bytes per pass)

Run: nohup python tools/exp_asm.py > /tmp/exp_asm.txt 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPS = 32


def main():
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from dynamicfusion_body_tpu.solvers import nonrigid as NR

    M, V, k = 4096, 32768, 3
    P = M * k
    D = NR.ELL_DEGREE_CAP
    rng = np.random.RandomState(0)
    nbr_idx = jnp.asarray(rng.randint(0, M, (V, k)).astype(np.int32))
    corr_mask = jnp.asarray(rng.rand(V) < 0.95)
    pair_i = jnp.asarray(np.repeat(np.arange(M, dtype=np.int32), k))
    pair_j = jnp.asarray(rng.randint(0, M, P).astype(np.int32))
    pair_mask = jnp.ones((P,), bool)

    reduce_ell, ell_nbr, self_ids, self_present, _ = NR.make_block_ell(
        nbr_idx, corr_mask, pair_i, pair_j, pair_mask, M, D
    )
    T = V * k * k + 4 * P
    x64 = jnp.asarray(rng.rand(64, T).astype(np.float32))
    # J-like inputs for the build variants
    J_d = jnp.asarray(rng.rand(V, k, 8).astype(np.float32))
    w_d = jnp.asarray(rng.rand(V).astype(np.float32))
    Ji24 = jnp.asarray(rng.rand(24, P).astype(np.float32))
    Jj24 = jnp.asarray(rng.rand(24, P).astype(np.float32))
    w_r3 = jnp.asarray(rng.rand(3, P).astype(np.float32))

    def timeit(name, body, init, n=3):
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
        ms = (np.median(ts) * 1000 - 32.0) / REPS
        print(f"{name:44s} {ms:9.4f} ms/op", flush=True)
        return ms

    # rebuild the sorted metadata exactly as make_block_ell does, for the
    # row-layout variants
    i32 = jnp.int32
    a_d = jnp.concatenate([nbr_idx[:, ka] for ka in range(k) for _ in range(k)])
    b_d = jnp.concatenate([nbr_idx[:, kb] for _ in range(k) for kb in range(k)])
    v_d = jnp.tile(corr_mask, k * k)
    a_r = jnp.concatenate([pair_i, pair_i, pair_j, pair_j])
    b_r = jnp.concatenate([pair_i, pair_j, pair_i, pair_j])
    v_r = jnp.tile(pair_mask, 4)
    a = jnp.concatenate([a_d, a_r]).astype(i32)
    b = jnp.concatenate([b_d, b_r]).astype(i32)
    valid = jnp.concatenate([v_d, v_r])
    BIG = jnp.int32(M * M)
    keys = jnp.where(valid, a * M + b, BIG)
    order = jnp.argsort(keys)
    sk = jnp.take(keys, order, axis=0)
    node = sk // M
    prev = jnp.concatenate([jnp.full((1,), -1, i32), sk[:-1]])
    seg_id = jnp.cumsum((sk != prev).astype(i32)) - 1
    first_idx = NR.searchsorted1d(node, jnp.arange(M, dtype=i32), side="left")
    first_seg = jnp.take(seg_id, jnp.minimum(first_idx, T - 1), axis=0)
    d_slot = seg_id - jnp.take(first_seg, jnp.minimum(node, M - 1), axis=0)
    dead = node >= M
    over = (d_slot >= D) & ~dead
    keep = (~(dead | over)).astype(jnp.float32)
    ids_mono = jnp.where(dead, M * D, node * D + jnp.minimum(d_slot, D - 1))
    slots = jnp.arange(M * D, dtype=i32)
    seg_hi = NR.searchsorted1d(ids_mono, slots, side="right")
    seg_lo = jnp.concatenate([jnp.zeros((1,), seg_hi.dtype), seg_hi[:-1]])

    # ---- A: current channel-major reduce
    def red_A(x):
        out = reduce_ell(x)
        return x + 1e-12 * out[0, 0]

    timeit("A_reduce_ell(64,T) current", red_A, x64)

    # ---- B: one transpose, then row-major reduce
    def row_reduce(xT):  # (T, 64) -> (M*D, 64)
        xs = jnp.take(xT, order, axis=0) * keep[:, None]
        csum = jnp.cumsum(xs, axis=0)
        padded = jnp.concatenate(
            [jnp.zeros((1,) + xT.shape[1:], xT.dtype), csum], axis=0
        )
        return jnp.take(padded, seg_hi, axis=0) - jnp.take(
            padded, seg_lo, axis=0
        )

    def red_B(x):
        out = row_reduce(x.T)
        return x + 1e-12 * out[0, 0]

    timeit("B_transpose+row_reduce(T,64)", red_B, x64)

    # ---- B2: row reduce only (input already (T,64))
    xT = jnp.asarray(np.ascontiguousarray(np.asarray(x64).T))

    def red_B2(x):
        out = row_reduce(x)
        return x + 1e-12 * out[0, 0]

    timeit("B2_row_reduce_only(T,64)", red_B2, xT)

    # ---- C: build contributions directly as (T, 64) rows
    def build_rows(_):
        Jw = J_d * w_d[:, None, None]                      # (V, k, 8)
        data_rows = [
            (Jw[:, ka, :, None] * J_d[:, kb, None, :]).reshape(V, 64)
            for ka in range(k)
            for kb in range(k)
        ]

        def reg_outer_T(Jx24, Jy24):
            return sum(
                (
                    (w_r3[c] * Jx24[c * 8:(c + 1) * 8]).T[:, :, None]
                    * Jy24[c * 8:(c + 1) * 8].T[:, None, :]
                )
                for c in range(3)
            ).reshape(-1, 64)

        contrib = jnp.concatenate(
            data_rows
            + [reg_outer_T(Ji24, Ji24), reg_outer_T(Ji24, Jj24),
               reg_outer_T(Jj24, Ji24), reg_outer_T(Jj24, Jj24)],
            axis=0,
        )
        return contrib

    def red_C(x):
        contrib = build_rows(None)
        out = row_reduce(contrib)
        return x + 1e-12 * out[0, 0] + 0.0 * x

    timeit("C_build_rows+row_reduce", red_C, x64[:1, :1])

    # ---- build in channel-major (what gn_solve_core does today), for
    # reference against C
    def build_cm(_):
        Jw = (J_d * w_d[:, None, None]).transpose(1, 2, 0)
        JdT = J_d.transpose(1, 2, 0)
        data_chunks = [
            (Jw[ka][:, None, :] * JdT[kb][None, :, :]).reshape(64, V)
            for ka in range(k) for kb in range(k)
        ]

        def reg_outer(Jx24, Jy24):
            return sum(
                ((w_r3[c] * Jx24[c * 8:(c + 1) * 8])[:, None, :]
                 * Jy24[c * 8:(c + 1) * 8][None, :, :]) for c in range(3)
            ).reshape(64, -1)

        return jnp.concatenate(
            data_chunks + [reg_outer(Ji24, Ji24), reg_outer(Ji24, Jj24),
                           reg_outer(Jj24, Ji24), reg_outer(Jj24, Jj24)],
            axis=1,
        )

    def red_CM(x):
        contrib = build_cm(None)
        out = reduce_ell(contrib)
        return x + 1e-12 * out[0, 0] + 0.0 * x

    timeit("CM_build_cm+reduce_ell(current full)", red_CM, x64[:1, :1])

    def red_CMB(x):
        contrib = build_cm(None)
        out = row_reduce(contrib.T)
        return x + 1e-12 * out[0, 0] + 0.0 * x

    timeit("CMB_build_cm+transpose+row_reduce", red_CMB, x64[:1, :1])

    # ---- D: bf16 single-pass row reduce (accuracy-losing reference point)
    def red_D(x):
        out = row_reduce(x.astype(jnp.bfloat16))
        return x + 1e-12 * out[0, 0].astype(jnp.float32)

    timeit("D_row_reduce_bf16(T,64)", red_D, xT)


if __name__ == "__main__":
    main()


def extra():
    """Two-level cumsum + symmetry variants (appended after round-4 run 1:
    all layout variants tied at ~7.5-8 ms -> the tax is the log-step
    cumsum's ~19 passes over the 88 MB array, not the gather. A blocked
    cumsum does 1 block-sum pass + log2(B) short within-block passes +
    tiny block-prefix scan)."""
    import jax
    import jax.numpy as jnp
    from dynamicfusion_body_tpu.solvers import nonrigid as NR
    import numpy as np
    import time

    M, V, k = 4096, 32768, 3
    P = M * k
    D = NR.ELL_DEGREE_CAP
    rng = np.random.RandomState(0)
    nbr_idx = jnp.asarray(rng.randint(0, M, (V, k)).astype(np.int32))
    corr_mask = jnp.asarray(rng.rand(V) < 0.95)
    pair_i = jnp.asarray(np.repeat(np.arange(M, dtype=np.int32), k))
    pair_j = jnp.asarray(rng.randint(0, M, P).astype(np.int32))
    pair_mask = jnp.ones((P,), bool)
    reduce_ell, *_ = NR.make_block_ell(
        nbr_idx, corr_mask, pair_i, pair_j, pair_mask, M, D
    )
    T = V * k * k + 4 * P
    x64 = jnp.asarray(rng.rand(64, T).astype(np.float32))

    i32 = jnp.int32
    a_d = jnp.concatenate([nbr_idx[:, ka] for ka in range(k) for _ in range(k)])
    b_d = jnp.concatenate([nbr_idx[:, kb] for _ in range(k) for kb in range(k)])
    v_d = jnp.tile(corr_mask, k * k)
    a_r = jnp.concatenate([pair_i, pair_i, pair_j, pair_j])
    b_r = jnp.concatenate([pair_i, pair_j, pair_i, pair_j])
    v_r = jnp.tile(pair_mask, 4)
    a = jnp.concatenate([a_d, a_r]).astype(i32)
    b = jnp.concatenate([b_d, b_r]).astype(i32)
    valid = jnp.concatenate([v_d, v_r])
    BIG = jnp.int32(M * M)
    keys = jnp.where(valid, a * M + b, BIG)
    order = jnp.argsort(keys)
    sk = jnp.take(keys, order, axis=0)
    node = sk // M
    prev = jnp.concatenate([jnp.full((1,), -1, i32), sk[:-1]])
    seg_id = jnp.cumsum((sk != prev).astype(i32)) - 1
    first_idx = NR.searchsorted1d(node, jnp.arange(M, dtype=i32), side="left")
    first_seg = jnp.take(seg_id, jnp.minimum(first_idx, T - 1), axis=0)
    d_slot = seg_id - jnp.take(first_seg, jnp.minimum(node, M - 1), axis=0)
    dead = node >= M
    over = (d_slot >= D) & ~dead
    keep = (~(dead | over)).astype(jnp.float32)
    ids_mono = jnp.where(dead, M * D, node * D + jnp.minimum(d_slot, D - 1))
    slots = jnp.arange(M * D, dtype=i32)
    seg_hi = NR.searchsorted1d(ids_mono, slots, side="right")
    seg_lo = jnp.concatenate([jnp.zeros((1,), seg_hi.dtype), seg_hi[:-1]])

    REPS = 32

    def timeit(name, body, init, n=3):
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
        ms = (np.median(ts) * 1000 - 32.0) / REPS
        print(f"{name:44s} {ms:9.4f} ms/op", flush=True)
        return ms

    # E: blocked cumsum channel-major (64, T): pad T to multiple of B,
    # block totals + within-block cumsum + block-prefix broadcast.
    for B in (256, 512, 1024, 2048):
        TB = -(-T // B) * B

        def red_E(x, B=B, TB=TB):
            xs = jnp.take(x, order, axis=1) * keep[None, :]
            xp = jnp.pad(xs, ((0, 0), (0, TB - T)))
            blk = xp.reshape(64, TB // B, B)
            tot = jnp.sum(blk, axis=2)                      # (64, TB/B)
            bpre = jnp.cumsum(tot, axis=1) - tot            # exclusive
            within = jnp.cumsum(blk, axis=2)
            csum = (within + bpre[:, :, None]).reshape(64, TB)[:, :T]
            padded = jnp.concatenate(
                [jnp.zeros((64, 1), x.dtype), csum], axis=1
            )
            out = jnp.take(padded, seg_hi, axis=1) - jnp.take(
                padded, seg_lo, axis=1
            )
            return x + 1e-12 * out[0, 0]

        timeit(f"E_blocked_cumsum_B{B}", red_E, x64)

    # F: verify correctness of E vs A
    B = 1024
    TB = -(-T // B) * B
    xs = jnp.take(x64, order, axis=1) * keep[None, :]
    xp = jnp.pad(xs, ((0, 0), (0, TB - T)))
    blk = xp.reshape(64, TB // B, B)
    tot = jnp.sum(blk, axis=2)
    bpre = jnp.cumsum(tot, axis=1) - tot
    within = jnp.cumsum(blk, axis=2)
    csum = (within + bpre[:, :, None]).reshape(64, TB)[:, :T]
    padded = jnp.concatenate([jnp.zeros((64, 1), jnp.float32), csum], axis=1)
    outE = jnp.take(padded, seg_hi, axis=1) - jnp.take(padded, seg_lo, axis=1)
    outA = reduce_ell(x64)
    print("E vs A max|diff| =", float(jnp.max(jnp.abs(outE - outA))),
          " scale =", float(jnp.max(jnp.abs(outA))), flush=True)


if __name__ == "__main__" and os.environ.get("EXP_EXTRA"):
    extra()
