"""Amortized sub-phase timing of marching_cubes at 256³ on the real TPU.

Methodology matches tools/profile_frame.py: T(1 call + fetch) vs
T(reps chained + fetch); per-call = (T_n - T_1)/(reps - 1). Run:
    nohup python tools/profile_mc.py > /tmp/profile_mc3.txt 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from benchmarks.suite import bumpy_sdf
    from dynamicfusion_body_tpu.ops import marching_cubes as M

    RES = 256
    vol = jnp.asarray(bumpy_sdf(RES, (128, 128, 128), 70.0, 4.0, 3.0, 0.0))
    print(f"# backend={jax.default_backend()}", flush=True)

    def f1(x):
        return float(jnp.ravel(x)[0] if hasattr(x, "ravel") else x)

    def timeit(name, fn, fetch, reps=8):
        fetch(fn())
        fetch(fn())
        t0 = time.time()
        fetch(fn())
        t1 = time.time() - t0
        t0 = time.time()
        out = None
        for _ in range(reps):
            out = fn()
        fetch(out)
        tn = time.time() - t0
        ms = (tn - t1) / (reps - 1) * 1000.0
        print(f"{name:32s} {ms:9.2f} ms   (1+fetch: {t1*1000:7.1f})",
              flush=True)
        return ms

    level = 0.0
    X = Y = Z = RES
    nxyz = X * Y * Z
    vert_cap, face_cap = 1 << 16, 1 << 17

    # --- full
    full = jax.jit(lambda v: M.marching_cubes(
        v, level=level, vert_cap=vert_cap, face_cap=face_cap, step_size=1))
    timeit("mc_full", lambda: full(vol), lambda m: f1(m["verts"]))

    # --- (a) crossing masks + vranks rowsums
    def phase_a(v):
        inside = v < level

        def axis_cross(a):
            sl_lo = [slice(None)] * 3
            sl_hi = [slice(None)] * 3
            sl_lo[a] = slice(0, v.shape[a] - 1)
            sl_hi[a] = slice(1, v.shape[a])
            cross = (v[tuple(sl_lo)] < level) != (v[tuple(sl_hi)] < level)
            pad = [(0, 0)] * 3
            pad[a] = (0, 1)
            return jnp.pad(cross, pad)

        flat_mask = jnp.concatenate(
            [axis_cross(a).reshape(-1) for a in range(3)])
        r = M._Ranks(flat_mask.astype(jnp.int8), 256)
        return r.total, r.gex

    pa = jax.jit(phase_a)
    timeit("a_crossmask_ranks", lambda: pa(vol), lambda o: f1(o[0]))

    # --- (b) unrank verts given ranks
    def phase_b(v):
        t, gex = phase_a(v)
        # rebuild Ranks-like unrank on the mask
        inside = v < level

        def axis_cross(a):
            sl_lo = [slice(None)] * 3
            sl_hi = [slice(None)] * 3
            sl_lo[a] = slice(0, v.shape[a] - 1)
            sl_hi[a] = slice(1, v.shape[a])
            cross = (v[tuple(sl_lo)] < level) != (v[tuple(sl_hi)] < level)
            pad = [(0, 0)] * 3
            pad[a] = (0, 1)
            return jnp.pad(cross, pad)

        flat_mask = jnp.concatenate(
            [axis_cross(a).reshape(-1) for a in range(3)])
        r = M._Ranks(flat_mask.astype(jnp.int8), 256)
        vslots = jnp.arange(vert_cap, dtype=jnp.int32)
        return r.unrank(vslots)

    pb = jax.jit(phase_b)
    timeit("b_a_plus_unrank", lambda: pb(vol), lambda o: f1(o))

    # --- (c) case + ntris + franks rowsums
    def phase_c(v):
        inside = v < level
        cx, cy, cz = X - 1, Y - 1, Z - 1
        case = jnp.zeros((cx, cy, cz), jnp.int32)
        for b in range(8):
            dx, dy, dz = b & 1, (b >> 1) & 1, (b >> 2) & 1
            case = case | (
                inside[dx:dx + cx, dy:dy + cy, dz:dz + cz].astype(jnp.int32)
                << b)
        ntris = M._ntris_chunked(case.reshape(-1))
        r = M._Ranks(ntris, 128)
        return r.total

    pc = jax.jit(phase_c)
    timeit("c_case_ntris_ranks", lambda: pc(vol), lambda o: f1(o))

    # --- (c2) case bytes only
    def phase_c2(v):
        inside = v < level
        cx, cy, cz = X - 1, Y - 1, Z - 1
        case = jnp.zeros((cx, cy, cz), jnp.int32)
        for b in range(8):
            dx, dy, dz = b & 1, (b >> 1) & 1, (b >> 2) & 1
            case = case | (
                inside[dx:dx + cx, dy:dy + cy, dz:dz + cz].astype(jnp.int32)
                << b)
        return jnp.sum(case)

    timeit("c2_casebytes_only", lambda: jax.jit(phase_c2)(vol),
           lambda o: f1(o))

    # --- (f) gradient
    def phase_f(v):
        gs = jnp.gradient(v)
        return gs[0][0, 0, 0] + gs[1][0, 0, 0] + gs[2][0, 0, 0]

    timeit("f_gradient", lambda: jax.jit(phase_f)(vol), lambda o: f1(o))

    # --- brick min/max activity (the sparse front-end candidate)
    def phase_g(v):
        vp = jnp.pad(v, ((0, 1), (0, 1), (0, 1)), mode="edge")
        mn = jax.lax.reduce_window(
            vp, jnp.inf, jax.lax.min, (9, 9, 9), (8, 8, 8), "VALID")
        mx = jax.lax.reduce_window(
            vp, -jnp.inf, jax.lax.max, (9, 9, 9), (8, 8, 8), "VALID")
        act = (mn < level) & (mx >= level)
        return jnp.sum(act.astype(jnp.int32))

    timeit("g_brick_minmax", lambda: jax.jit(phase_g)(vol), lambda o: f1(o))
    n_act = int(jax.jit(phase_g)(vol))
    print(f"# active bricks (9^3 halo, 8 stride): {n_act} / {32**3}",
          flush=True)

    # ---- emission sub-phases on CONCRETE rank structures (passed as jit
    # args so only the queried op is timed; the _Ranks rebuild inside is
    # a rowsum + tiny scan, ≈ phase a/c cost, subtracted out by chaining)
    m = full(vol)
    # vertex-edge mask (for vranks) and ntris (for franks), concrete
    inside = np.asarray(vol) < level

    def axis_cross_np(a):
        sl_lo = [slice(None)] * 3
        sl_hi = [slice(None)] * 3
        sl_lo[a] = slice(0, RES - 1)
        sl_hi[a] = slice(1, RES)
        cross = inside[tuple(sl_lo)] != inside[tuple(sl_hi)]
        pad = [(0, 0)] * 3
        pad[a] = (0, 1)
        return np.pad(cross, pad)

    vmask_np = np.concatenate(
        [axis_cross_np(a).reshape(-1) for a in range(3)]).astype(np.int8)
    case_np = np.zeros((RES - 1,) * 3, np.int32)
    for b in range(8):
        dx, dy, dz = b & 1, (b >> 1) & 1, (b >> 2) & 1
        case_np |= (
            inside[dx:dx + RES - 1, dy:dy + RES - 1, dz:dz + RES - 1]
            .astype(np.int32) << b)
    ntris_np = np.asarray(
        jax.jit(M._ntris_chunked)(jnp.asarray(case_np.reshape(-1))))
    vmask_j = jnp.asarray(vmask_np)
    ntris_j = jnp.asarray(ntris_np.astype(np.int32))

    fslots = jnp.arange(face_cap, dtype=jnp.int32)
    vslots = jnp.arange(vert_cap, dtype=jnp.int32)

    def ranks_build_v(mask):
        return M._Ranks(mask, 256).total

    timeit("h_vranks_build", lambda: jax.jit(ranks_build_v)(vmask_j),
           lambda o: f1(o))

    def unrank_faces(ntris):
        return M._Ranks(ntris, 128).unrank(fslots)

    timeit("i_franks_unrank_262k", lambda: jax.jit(unrank_faces)(ntris_j),
           lambda o: f1(o))

    cell_of_face = jax.jit(unrank_faces)(ntris_j)
    # representative global edge ids for rank_incl: 3 per face
    rng = np.random.RandomState(0)
    eids = jnp.asarray(
        rng.randint(0, 3 * nxyz, size=(face_cap,), dtype=np.int64)
        .astype(np.int32))

    def rank_incl_v(mask, q):
        return M._Ranks(mask, 256).rank_incl(q)

    timeit("j_vranks_rank_incl_262k",
           lambda: jax.jit(rank_incl_v)(vmask_j, eids), lambda o: f1(o))

    acase = jnp.take(jnp.asarray(case_np.reshape(-1)), cell_of_face, axis=0)

    def onehot15(ac):
        return M._onehot_rows(ac, M._TRI15, 15)

    timeit("k_onehot_tri15_262k", lambda: jax.jit(onehot15)(acase),
           lambda o: f1(o))

    def unrank_verts(mask):
        return M._Ranks(mask, 256).unrank(vslots)

    timeit("l_vranks_unrank_131k", lambda: jax.jit(unrank_verts)(vmask_j),
           lambda o: f1(o))


if __name__ == "__main__":
    main()
