"""Per-phase timing of the fused frame's constituents on the real TPU.

Mirrors bench.py's setup, then times each phase as its own jitted program.

Methodology: the axon tunnel costs 50-180 ms PER dispatch+fetch round
trip (measured round 3) — naive per-call timing is tunnel noise, not
device time. Each phase is therefore timed amortized: T(1 call + fetch)
vs T(reps chained calls + fetch); per-call = (T_n - T_1)/(reps-1).
Chained calls dispatch async on one stream, so the difference is pure
device time.

Run: nohup python tools/profile_frame.py > /tmp/profile_frame.txt 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_timer(jnp):
    def f1(x):
        return float(jnp.ravel(x)[0] if hasattr(x, "ravel") else x)

    def timeit(name, fn, fetch, reps=8):
        fetch(fn())  # warm/compile
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

    return f1, timeit


def main():
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bench import bumpy_sdf, RES
    from dynamicfusion_body_tpu.models import warp_field as WF
    from dynamicfusion_body_tpu.ops.marching_cubes import marching_cubes
    from dynamicfusion_body_tpu.pipeline.frame import (
        _blend_weights, init_canonical,
    )
    from dynamicfusion_body_tpu.pipeline.correspondence import (
        closest_point_correspondences,
    )
    from dynamicfusion_body_tpu.solvers.nonrigid import (
        make_reg_pairs, solve_nonrigid,
    )
    from dynamicfusion_body_tpu.solvers.rigid import solve_rigid
    from dynamicfusion_body_tpu.ops.trilerp_pallas import (
        trilerp_bricks, trilerp_bricks_supported,
    )

    f1, timeit = make_timer(jnp)

    canonical = bumpy_sdf(RES, (128, 128, 128), 70.0, 4.0, 3.0, 0.0)
    live = jnp.asarray(bumpy_sdf(RES, (130, 129, 128), 70.0, 4.0, 3.0, 0.1))
    tdist = float(canonical.max())
    values = jnp.asarray(canonical)
    caps = dict(vert_cap=1 << 15, face_cap=1 << 16)
    wf, radius = init_canonical(
        values, subsample_rate=1.5, node_cap=4096, mc_step=2, **caps
    )
    knn_k = 3
    print(f"# backend={jax.default_backend()} nodes={int(wf.num_active)}",
          flush=True)

    # tunnel floor for reference
    triv = jax.jit(lambda x: x + 1.0)
    z8 = jnp.zeros((8, 128))
    timeit("tunnel_floor_trivial", lambda: triv(z8), lambda r: f1(r))

    # ---- marching cubes ---------------------------------------------------
    mc_live = jax.jit(lambda v: marching_cubes(
        v, 0.0, vert_cap=1 << 17, face_cap=1 << 18, step_size=1))
    mc_canon = jax.jit(lambda v: marching_cubes(
        v, 0.0, vert_cap=1 << 15, face_cap=1 << 16, step_size=2))
    timeit("mc_live_256_full", lambda: mc_live(live), lambda m: f1(m["verts"]))
    timeit("mc_canon_step2", lambda: mc_canon(values), lambda m: f1(m["verts"]))

    mesh = mc_canon(values)
    vmask = np.arange(1 << 15) < int(mesh["n_verts"])
    vmask = jnp.asarray(vmask)
    live_mesh = mc_live(live)
    lmask = jnp.asarray(np.arange(1 << 17) < int(live_mesh["n_verts"]))
    nbr_idx = WF.neighbor_lookup(wf, mesh["verts"], knn_k)
    blend_wts = _blend_weights(wf, mesh["verts"], nbr_idx)

    # ---- correspondences --------------------------------------------------
    corr_fn = jax.jit(lambda: closest_point_correspondences(
        mesh["verts"], mesh["normals"], vmask, live_mesh["verts"], lmask,
        knn_k, 5.0, approx=True))
    timeit("correspondence_approx", corr_fn, lambda o: f1(o[0]))

    corr, cvalid, _ = corr_fn()

    # ---- rigid solve ------------------------------------------------------
    lw = jnp.array([1, 0, 0, 0, 0, 0.1, 0, 0], jnp.float32)
    pv, pn = WF.warp_points(wf, mesh["verts"], nbr_idx, normals=mesh["normals"])
    rig = jax.jit(lambda: solve_rigid(lw, pv, pn, corr, cvalid, iterations=12))
    timeit("rigid_solve_12", rig, lambda o: f1(o[0]))
    rig4 = jax.jit(lambda: solve_rigid(lw, pv, pn, corr, cvalid, iterations=4))
    timeit("rigid_solve_4", rig4, lambda o: f1(o[0]))

    # ---- non-rigid solve (one round, 8 GN x 16 CG) ------------------------
    pair_i, pair_j, pair_scale, pmask = make_reg_pairs(
        wf.node_vert_idx, nbr_idx, wf.node_w, wf.active, jnp.float32(0.5))
    pair_v = jnp.take(wf.node_pos, pair_j, axis=0)
    solve = jax.jit(lambda: solve_nonrigid(
        wf.node_dq, mesh["verts"], mesh["normals"], corr, cvalid, nbr_idx,
        blend_wts, pair_i, pair_j, pair_v, pair_scale, pmask, lw,
        gn_iters=8, cg_iters=16))
    timeit("nonrigid_solve_8gn16cg", solve, lambda o: f1(o[1]))
    solve2 = jax.jit(lambda: solve_nonrigid(
        wf.node_dq, mesh["verts"], mesh["normals"], corr, cvalid, nbr_idx,
        blend_wts, pair_i, pair_j, pair_v, pair_scale, pmask, lw,
        gn_iters=1, cg_iters=16))
    timeit("nonrigid_solve_1gn16cg", solve2, lambda o: f1(o[1]))

    # ---- updateTSDF -------------------------------------------------------
    weights = jnp.ones_like(values)
    use_pallas = (jax.default_backend() == "tpu"
                  and trilerp_bricks_supported((RES,) * 3, 8))
    upd = jax.jit(lambda: WF.update_tsdf_nonrigid(
        values, weights, live, wf, lw, k=knn_k, tdist=tdist, wmax=100.0,
        brick=8, n_candidates=16, use_pallas=use_pallas))
    timeit("update_tsdf_full", upd, lambda o: f1(o[0]))

    # brick candidate search alone
    bc = jax.jit(lambda: WF.brick_candidates_2level(
        wf, (RES,) * 3, 8, 16))
    timeit("brick_candidates_2level", bc, lambda o: f1(o))

    # trilerp kernel alone on representative warped coords
    NB = (RES // 8) ** 3
    V = 512
    rng = np.random.RandomState(0)
    base = rng.rand(NB, 1, 3).astype(np.float32) * (RES - 12)
    offs = rng.rand(NB, V, 3).astype(np.float32) * 8.0
    w = base + offs
    wx = jnp.asarray(w[..., 0]); wy = jnp.asarray(w[..., 1])
    wz = jnp.asarray(w[..., 2])
    # NB: coords must be jit ARGS — baked as constants they overflow the
    # axon remote-compile request body (HTTP 413).
    tri = jax.jit(trilerp_bricks)
    timeit("trilerp_pallas_16.7M", lambda: tri(live, wx, wy, wz),
           lambda o: f1(o[0]))

    ug = jax.jit(lambda: WF.update_graph(wf, mesh["verts"], vmask, knn_k))
    timeit("update_graph", ug, lambda o: f1(o[0].node_pos))


if __name__ == "__main__":
    main()
