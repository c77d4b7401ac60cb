"""Round-5 solve decomposition at bench scale (VERDICT r4 weak #1:
"the builder must measure, not guess").

Times, as separate jitted programs on the real chip:
  * make_block_ell (the slot dictionary: one argsort over ~344k keys)
  * the make_sorted_reducer builds gn_solve_core repeats per call
  * gn_solve_core with gn_iters 8 vs 1 (marginal per-GN-step cost) and
    with a PREBUILT ell_ctx vs rebuilding it inside (the per-call fixed
    cost the relaxed one-trajectory solver amortizes to once per frame)
  * the Jacobian pass alone (vmap jacfwd over k·8=24 params per vertex)
  * a residual pass alone
  * the cached-candidate correspondence re-rank per solve round

Run: nohup python tools/profile_solve5.py > /tmp/profile_solve5.txt 2>&1 &
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

    from bench import bumpy_sdf, RES
    from dynamicfusion_body_tpu.models import warp_field as WF
    from dynamicfusion_body_tpu.ops.marching_cubes import marching_cubes
    from dynamicfusion_body_tpu.pipeline.frame import (
        _blend_weights, init_canonical,
    )
    from dynamicfusion_body_tpu.pipeline.correspondence import (
        closest_point_correspondences,
        correspondence_candidates,
        correspondences_from_candidates,
    )
    from dynamicfusion_body_tpu.solvers import nonrigid as NR
    from tools.profile_frame import make_timer

    f1, timeit = make_timer(jnp)

    canonical = bumpy_sdf(RES, (128, 128, 128), 70.0, 4.0, 3.0, 0.0)
    live = jnp.asarray(bumpy_sdf(RES, (130, 129, 128), 70.0, 4.0, 3.0, 0.1))
    values = jnp.asarray(canonical)
    caps = dict(vert_cap=1 << 15, face_cap=1 << 16)
    wf, radius = init_canonical(
        values, subsample_rate=1.5, node_cap=4096, mc_step=2, **caps
    )
    knn_k = 3
    M = wf.node_pos.shape[0]
    print(f"# backend={jax.default_backend()} nodes={int(wf.num_active)} "
          f"M={M}", flush=True)

    mc_canon = jax.jit(lambda v: marching_cubes(
        v, 0.0, vert_cap=1 << 15, face_cap=1 << 16, step_size=2))
    mesh = mc_canon(values)
    vmask = jnp.asarray(np.arange(1 << 15) < int(mesh["n_verts"]))
    live_mesh = jax.jit(lambda v: marching_cubes(
        v, 0.0, vert_cap=1 << 17, face_cap=1 << 18, step_size=1,
        with_normals=False))(live)
    lmask = jnp.asarray(np.arange(1 << 17) < int(live_mesh["n_verts"]))
    nbr_idx = WF.neighbor_lookup(wf, mesh["verts"], knn_k)
    blend_wts = _blend_weights(wf, mesh["verts"], nbr_idx)
    lw = jnp.array([1, 0, 0, 0, 0, 0.1, 0, 0], jnp.float32)

    corr, cvalid, _ = jax.jit(lambda: closest_point_correspondences(
        mesh["verts"], mesh["normals"], vmask, live_mesh["verts"], lmask,
        knn_k, 5.0, approx=True))()
    pair_i, pair_j, pair_scale, pmask = NR.make_reg_pairs(
        wf.node_vert_idx, nbr_idx, wf.node_w, wf.active, jnp.float32(0.5))
    pair_v = jnp.take(wf.node_pos, pair_j, axis=0)
    data_args = (mesh["verts"], mesh["normals"], corr, cvalid, nbr_idx,
                 blend_wts)
    reg_args = (pair_i, pair_j, pair_v, pair_scale, pmask)

    # ---- slot dictionary + reducers (the per-round fixed cost) ----------
    ell_fn = jax.jit(lambda: NR.make_block_ell(
        nbr_idx, cvalid, pair_i, pair_j, pmask, M, NR.ELL_DEGREE_CAP)[1])
    timeit("make_block_ell_dict", ell_fn, lambda o: f1(o))

    red_fn = jax.jit(lambda: NR.make_sorted_reducer(
        nbr_idx.reshape(-1), M)(jnp.ones((8, nbr_idx.size), jnp.float32)))
    timeit("sorted_reducer_build+call", red_fn, lambda o: f1(o))

    # ---- residual + jacobian passes -------------------------------------
    res_fn = jax.jit(lambda: NR._residuals(wf.node_dq, data_args, reg_args,
                                           lw)[0])
    timeit("residual_pass", res_fn, lambda o: f1(o))

    def jac_pass():
        def one_data(dqs_k, vert, normal, c, wts_k, lw_):
            f = lambda d: NR.data_residual_one(d, vert, normal, c, wts_k,
                                               lw_)
            return f(dqs_k), jax.jacfwd(f)(dqs_k)

        dqs_v = jnp.take(wf.node_dq, nbr_idx, axis=0)
        r, J = jax.vmap(one_data, in_axes=(0, 0, 0, 0, 0, None))(
            dqs_v, mesh["verts"], mesh["normals"], corr, blend_wts, lw)
        return J

    timeit("jacobian_pass_24tangent", jax.jit(jac_pass), lambda o: f1(o))

    # ---- full solves -----------------------------------------------------
    for gn in (8, 1):
        s = jax.jit(lambda gn=gn: NR.solve_nonrigid(
            wf.node_dq, *data_args, *reg_args, lw,
            gn_iters=gn, cg_iters=16, dense_pairs=True))
        timeit(f"solve_{gn}gn16cg_inline_ell", s, lambda o: f1(o[1]))

    # prebuilt ell_ctx (what the one-trajectory solver amortizes)
    ell_ctx = NR.make_block_ell(
        nbr_idx, cvalid, pair_i, pair_j, pmask, M, NR.ELL_DEGREE_CAP)

    for gn in (8, 1):
        s = jax.jit(lambda gn=gn: NR.gn_solve_core(
            wf.node_dq, data_args, reg_args, lw,
            gn, 16, 1e-4, 1e-5, lambda x: x, dense_pairs=True,
            ell_ctx=ell_ctx))
        timeit(f"solve_{gn}gn16cg_prebuilt_ell", s, lambda o: f1(o[1]))

    # prebuilt SolverCtx — the fusion_frame path (dictionary from vmask)
    solver_ctx = NR.make_solver_ctx(nbr_idx, vmask, pair_i, pair_j,
                                    pmask, M)
    for gn in (8, 1):
        s = jax.jit(lambda gn=gn: NR.gn_solve_core(
            wf.node_dq, data_args, reg_args, lw,
            gn, 16, 1e-4, 1e-5, lambda x: x, dense_pairs=True,
            solver_ctx=solver_ctx))
        timeit(f"solve_{gn}gn16cg_prebuilt_ctx", s, lambda o: f1(o[1]))

    # assembly reduce isolated from the GN loop
    V = mesh["verts"].shape[0]
    k = knn_k
    key = jax.random.PRNGKey(0)
    J_d = jax.random.normal(key, (V, k, 8), jnp.float32)
    w_d = jnp.abs(jax.random.normal(key, (V,), jnp.float32)) * cvalid
    P = pair_i.shape[0]
    Ji24 = jax.random.normal(key, (24, P), jnp.float32)
    Jj24 = jax.random.normal(key, (24, P), jnp.float32)
    w_r3 = jnp.abs(jax.random.normal(key, (3, P), jnp.float32))

    def reg_outer(Jx24, Jy24):
        return sum(
            ((w_r3[c] * Jx24[c * 8:(c + 1) * 8])[:, None, :]
             * Jy24[c * 8:(c + 1) * 8][None, :, :])
            for c in range(3)
        ).reshape(64, -1)

    def asm_old():
        Jw = (J_d * w_d[:, None, None]).transpose(1, 2, 0)
        JdT = J_d.transpose(1, 2, 0)
        chunks = [
            (Jw[ka][:, None, :] * JdT[kb][None, :, :]).reshape(64, V)
            for ka in range(k) for kb in range(k)
        ]
        contrib = jnp.concatenate(
            chunks + [reg_outer(Ji24, Ji24), reg_outer(Ji24, Jj24),
                      reg_outer(Jj24, Ji24), reg_outer(Jj24, Jj24)],
            axis=1)
        return ell_ctx[0](contrib)

    timeit("assembly_gather64_reduce", jax.jit(asm_old), lambda o: f1(o))

    # ---- per-round correspondence re-rank --------------------------------
    wv0, wn0 = WF.warp_points(
        wf, mesh["verts"], nbr_idx, normals=mesh["normals"], m_lw=lw)
    cand_idx, d_kc, _ = jax.jit(lambda: correspondence_candidates(
        wv0, vmask, live_mesh["verts"], lmask, kc=12, approx=True))()
    rerank = jax.jit(lambda: correspondences_from_candidates(
        wv0, wn0, vmask, live_mesh["verts"], lmask, cand_idx, d_kc, wv0,
        knn_k, 5.0)[0])
    timeit("corr_rerank_cached", rerank, lambda o: f1(o))

    warp_fn = jax.jit(lambda: WF.warp_points(
        wf, mesh["verts"], nbr_idx, normals=mesh["normals"], m_lw=lw)[0])
    timeit("warp_points_mesh", warp_fn, lambda o: f1(o))


if __name__ == "__main__":
    main()
