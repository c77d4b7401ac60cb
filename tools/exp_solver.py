"""Solver-cost decomposition + fused-frame knob sweep on the real TPU.

Round-3 regression postmortem driver: measures (a) the standalone
non-rigid GN solve at several cg_iters to split per-step fixed cost
(Jacobian build + normal blocks + residual pass) from per-CG-iteration
cost, and (b) the amortized fused-frame chain (bench.py methodology) at
candidate (gn_iters, cg_iters, ftol) settings, with the final huberized
cost so speed can't silently come from under-solving.

Run: nohup python tools/exp_solver.py > /tmp/exp_solver.txt 2>&1 &
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

    from bench import RES, bumpy_sdf
    from dynamicfusion_body_tpu.models import warp_field as WF
    from dynamicfusion_body_tpu.ops.marching_cubes import marching_cubes
    from dynamicfusion_body_tpu.ops.trilerp_pallas import (
        trilerp_bricks_supported,
    )
    from dynamicfusion_body_tpu.pipeline.correspondence import (
        closest_point_correspondences,
    )
    from dynamicfusion_body_tpu.pipeline.frame import (
        _blend_weights, fusion_frame, init_canonical,
    )
    from dynamicfusion_body_tpu.solvers.nonrigid import (
        make_reg_pairs, solve_nonrigid,
    )

    def f1(x):
        return float(jnp.ravel(x)[0])

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
        print(f"{name:36s} {ms:9.2f} ms", flush=True)
        return ms

    canonical = bumpy_sdf(RES, (128, 128, 128), 70.0, 4.0, 3.0, 0.0)
    lives = [
        jnp.asarray(bumpy_sdf(RES, (130, 129, 128), 70.0, 4.0, 3.0, 0.05 * i))
        for i in range(1, 7)
    ]
    live = lives[1]
    tdist = float(canonical.max())
    values = jnp.asarray(canonical)
    weights = jnp.zeros_like(values)
    caps = dict(vert_cap=1 << 15, face_cap=1 << 16)
    live_caps = dict(live_vert_cap=1 << 17, live_face_cap=1 << 18)
    wf, radius = init_canonical(
        values, subsample_rate=1.5, node_cap=4096, mc_step=2, **caps
    )
    knn_k = 3
    print(f"# backend={jax.default_backend()} nodes={int(wf.num_active)}",
          flush=True)

    # ---- standalone solve: fixed-vs-CG cost decomposition ------------------
    mc_canon = jax.jit(lambda v: marching_cubes(
        v, 0.0, vert_cap=1 << 15, face_cap=1 << 16, step_size=2))
    mc_live = jax.jit(lambda v: marching_cubes(
        v, 0.0, vert_cap=1 << 17, face_cap=1 << 18, step_size=1))
    mesh = mc_canon(values)
    vmask = jnp.asarray(np.arange(1 << 15) < int(mesh["n_verts"]))
    live_mesh = mc_live(live)
    lmask = jnp.asarray(np.arange(1 << 17) < int(live_mesh["n_verts"]))
    nbr_idx = WF.neighbor_lookup(wf, mesh["verts"], knn_k)
    blend_wts = _blend_weights(wf, mesh["verts"], nbr_idx)
    corr, cvalid, _ = jax.jit(lambda: closest_point_correspondences(
        mesh["verts"], mesh["normals"], vmask, live_mesh["verts"], lmask,
        knn_k, 5.0, approx=True))()
    lw = jnp.array([1, 0, 0, 0, 0, 0.1, 0, 0], jnp.float32)
    pair_i, pair_j, pair_scale, pmask = make_reg_pairs(
        wf.node_vert_idx, nbr_idx, wf.node_w, wf.active, jnp.float32(0.5))
    pair_v = jnp.take(wf.node_pos, pair_j, axis=0)

    if os.environ.get("EXP_STANDALONE"):
        for cg in (16, 8, 2):
            s = jax.jit(lambda cg=cg: solve_nonrigid(
                wf.node_dq, mesh["verts"], mesh["normals"], corr, cvalid,
                nbr_idx, blend_wts, pair_i, pair_j, pair_v, pair_scale,
                pmask, lw, gn_iters=8, cg_iters=cg, dense_pairs=True))
            timeit(f"solve_8gn_{cg}cg_flat_exit", s, lambda o: f1(o[1]))

    # ---- fused-frame chain at candidate knobs ------------------------------
    base = dict(
        regularization_weight=0.5, knn_k=3, tdist=tdist, mc_step=2,
        solve_iters=3, n_candidates=16, tolerance=5.0,
        approx_knn=True,
        use_pallas=trilerp_bricks_supported((RES,) * 3, 8),
        **caps, **live_caps,
    )

    def chain_ms(hyper):
        def frame(values, weights, wf, lw_, live_, mesh_):
            return fusion_frame(values, weights, live_, wf, lw_,
                                canon_mesh=mesh_, **hyper)

        out = frame(values, weights, wf, lw, lives[0], None)
        _ = f1(out[4].cost_after)
        out2 = frame(*out[:4], lives[0], out[5])
        _ = f1(out2[4].cost_after)

        def run_chain(state, frames):
            v, w, wf_, lw_, mesh_ = state
            st = None
            for lv in frames:
                v, w, wf_, lw_, st, mesh_ = frame(v, w, wf_, lw_, lv, mesh_)
            _ = f1(st.cost_after)
            return (v, w, wf_, lw_, mesh_), st

        state = (*out2[:4], out2[5])
        t0 = time.time()
        state, _ = run_chain(state, lives[:1])
        t1 = time.time() - t0
        t0 = time.time()
        state, st = run_chain(state, lives)
        tk = time.time() - t0
        ms = (tk - t1) / (len(lives) - 1) * 1000.0
        cb = np.asarray(st.cost_before)
        ca = np.asarray(st.cost_after)
        return ms, cb, ca, state

    results = {}
    for name, over in (
        ("gn2_cg16", dict(gn_iters=2, cg_iters=16, ftol=1e-5)),
        ("gn3_cg16", dict(gn_iters=3, cg_iters=16, ftol=1e-5)),
        ("gn4_cg16", dict(gn_iters=4, cg_iters=16, ftol=1e-5)),
        ("gn8_cg16", dict(gn_iters=8, cg_iters=16, ftol=1e-5)),
    ):
        hyper = dict(base)
        hyper.update(over)
        ms, cb, ca, state = chain_ms(hyper)
        results[name] = (hyper, state)
        print(f"chain {name:12s} {ms:9.1f} ms/frame  rounds cb={cb} ca={ca}",
              flush=True)

    # accuracy of each config vs one exact-arm frame (gn8 cg32, fresh
    # exact correspondences) from the gn8 steady state
    _, state_ref = results["gn8_cg16"]
    v0, w0, wf0, lw0, mesh0 = state_ref
    exact = dict(base)
    exact.update(gn_iters=8, cg_iters=32, ftol=1e-5, approx_knn=False,
                 reuse_corr=False)
    out_e = fusion_frame(v0, w0, lives[0], wf0, lw0, canon_mesh=mesh0,
                         **exact)
    v_e = out_e[0]
    ca_e = np.asarray(out_e[4].cost_after)
    ce = float(ca_e[ca_e > 0][-1]) if (ca_e > 0).any() else 0.0
    for name, (hyper, _) in results.items():
        out_f = fusion_frame(v0, w0, lives[0], wf0, lw0, canon_mesh=mesh0,
                             **hyper)
        adiff = jnp.abs(out_f[0] - v_e)
        p999 = float(jnp.quantile(adiff.reshape(-1), 0.999))
        ca_f = np.asarray(out_f[4].cost_after)
        cf = float(ca_f[ca_f > 0][-1]) if (ca_f > 0).any() else 0.0
        print(f"acc {name:12s} tsdf_p999={p999:.4f} cost={cf:.2f} "
              f"vs exact {ce:.2f} ratio={cf/max(ce,1e-9):.4f}", flush=True)


if __name__ == "__main__":
    main()
