"""Amortized timing of the nonrigid solve + correspondence tail at bench
scale: splits fixed cost vs per-GN vs per-CG. Run:
    nohup python tools/profile_solve.py > /tmp/profile_solve3.txt 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from benchmarks.suite import bumpy_sdf
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

    RES = 256
    knn_k = 3
    canonical = bumpy_sdf(RES, (128, 128, 128), 70.0, 4.0, 3.0, 0.0)
    live = jnp.asarray(bumpy_sdf(RES, (130, 129, 128), 70.0, 4.0, 3.0, 0.1))
    values = jnp.asarray(canonical)
    wf, radius = init_canonical(values, subsample_rate=1.5, node_cap=4096,
                                mc_step=2, vert_cap=1 << 15, face_cap=1 << 16)
    lw = jnp.array([1, 0, 0, 0, 0, 0.1, 0, 0], jnp.float32)
    print(f"# backend={jax.default_backend()} nodes={int(wf.num_active)}",
          flush=True)

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
        print(f"{name:36s} {ms:9.2f} ms   (1+fetch: {t1*1000:7.1f})",
              flush=True)
        return ms

    mc_canon = jax.jit(lambda v: marching_cubes(
        v, 0.0, vert_cap=1 << 15, face_cap=1 << 16, step_size=2))
    mesh = mc_canon(values)
    vmask = jnp.arange(1 << 15) < mesh["n_verts"]
    mc_live = jax.jit(lambda v: marching_cubes(
        v, 0.0, vert_cap=1 << 17, face_cap=1 << 18, step_size=1))
    live_mesh = mc_live(live)
    lmask = jnp.arange(1 << 17) < live_mesh["n_verts"]
    print(f"# canon verts={int(mesh['n_verts'])} "
          f"live verts={int(live_mesh['n_verts'])}", flush=True)

    nbr_idx = WF.neighbor_lookup(wf, mesh["verts"], knn_k)
    blend_wts = _blend_weights(wf, mesh["verts"], nbr_idx)
    wv, wn = WF.warp_points(wf, mesh["verts"], nbr_idx,
                            normals=mesh["normals"], m_lw=lw)

    # correspondence: exact vs approx
    corr_exact = jax.jit(lambda: closest_point_correspondences(
        wv, wn, vmask, live_mesh["verts"], lmask, knn_k, 5.0, approx=False))
    corr_approx = jax.jit(lambda: closest_point_correspondences(
        wv, wn, vmask, live_mesh["verts"], lmask, knn_k, 5.0, approx=True))
    timeit("corr_exact", corr_exact, lambda o: f1(o[0]))
    timeit("corr_approx", corr_approx, lambda o: f1(o[0]))

    corr, cvalid, _ = corr_approx()

    pair_i, pair_j, pair_scale, pmask = make_reg_pairs(
        wf.node_vert_idx, nbr_idx, wf.node_w, wf.active, jnp.float32(0.5))
    pair_v = jnp.take(wf.node_pos, pair_j, axis=0)
    data_args = (mesh["verts"], mesh["normals"], corr, cvalid, nbr_idx,
                 blend_wts)

    def solve(gn, cg):
        return jax.jit(lambda: solve_nonrigid(
            wf.node_dq, *data_args, pair_i, pair_j, pair_v, pair_scale,
            pmask, lw, gn_iters=gn, cg_iters=cg, dense_pairs=True))

    for gn, cg in [(1, 1), (1, 4), (1, 16), (2, 16), (4, 16), (8, 16),
                   (8, 4)]:
        timeit(f"solve_gn{gn}_cg{cg}", solve(gn, cg), lambda o: f1(o[0]))


if __name__ == "__main__":
    main()
