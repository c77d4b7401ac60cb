"""Reconcile the bench accuracy gate's cost ratio (round-3 weak #2).

BENCH_r03 shipped cost_ratio fast/exact = 1.55 while the round-3 GN-depth
study measured 1.10 — this script reproduces the gate at the bench's
post-chain state and bisects WHICH approximation owns the residual gap.

Two measurements per arm:
1. the in-frame final huberized solve cost (what the gate compares) —
   NOTE this is measured against each arm's OWN correspondence set, so
   arms with different (equally valid) matches solve slightly different
   objective instances;
2. a COMMON-objective tracking energy: the final warp's huberized
   point-plane data cost under a FRESH EXACT correspondence search at
   that warp — apples-to-apples across arms (the thing gate 2 actually
   wants to bound).

Arms: fast (all approximations), exact (none), and fast with exactly one
approximation disabled (cg32 / exact kNN / fresh corr per round / flat
brick candidates) to attribute the gap.

Run: nohup python tools/diag_gate.py > /tmp/diag_gate.txt 2>&1 &
"""

import os
import sys

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
    from dynamicfusion_body_tpu.pipeline.frame import (
        fusion_frame, init_canonical,
    )
    from dynamicfusion_body_tpu.pipeline.correspondence import (
        closest_point_correspondences,
    )
    from dynamicfusion_body_tpu.ops.marching_cubes import marching_cubes
    from dynamicfusion_body_tpu.solvers import nonrigid as NR
    from dynamicfusion_body_tpu.ops.trilerp_pallas import (
        trilerp_bricks_supported,
    )

    canonical = bumpy_sdf(RES, (128, 128, 128), 70.0, 4.0, 3.0, 0.0)
    lives = [
        jnp.asarray(bumpy_sdf(RES, (130, 129, 128), 70.0, 4.0, 3.0, 0.05 * i))
        for i in range(1, 7)
    ]
    tdist = float(canonical.max())
    values = jnp.asarray(canonical)
    weights = jnp.zeros_like(values)
    caps = dict(vert_cap=1 << 15, face_cap=1 << 16)
    live_caps = dict(live_vert_cap=1 << 17, live_face_cap=1 << 18)
    wf, _ = init_canonical(
        values, subsample_rate=1.5, node_cap=4096, mc_step=2, **caps
    )
    lw = jnp.array([1, 0, 0, 0, 0, 0.1, 0, 0], jnp.float32)
    hyper = dict(
        regularization_weight=0.5, knn_k=3, tdist=tdist, mc_step=2,
        solve_iters=3, gn_iters=8, cg_iters=16, tolerance=5.0,
        n_candidates=16,
        approx_knn=jax.default_backend() == "tpu",
        use_pallas=(jax.default_backend() == "tpu"
                    and trilerp_bricks_supported((RES,) * 3, 8)),
        **caps, **live_caps,
    )
    print(f"# backend={jax.default_backend()}", flush=True)

    # drive to the bench's post-chain state (9 fast frames: 2 warmup,
    # 1 single, 6 chained — bench.py uses lives[0],lives[0],lives[0],
    # then lives[0..5])
    state = (values, weights, wf, lw, None)
    for live in [lives[0]] * 3 + lives:
        v, w, wf_, lw_, st, mesh = fusion_frame(
            state[0], state[1], live, state[2], state[3],
            canon_mesh=state[4], **hyper
        )
        state = (v, w, wf_, lw_, mesh)
    _ = float(st.cost_after[-1])
    values0, weights0, wf0, lw0, mesh0 = state
    live0 = lives[0]
    print("# chain done", flush=True)

    # common-objective tracking energy: fresh EXACT correspondences at
    # the given warp, huberized point-plane data cost (pair_mask all
    # false zeroes the reg term)
    live_mesh = marching_cubes(
        live0, level=0.0, vert_cap=1 << 17, face_cap=1 << 18, step_size=1,
    )
    lmask = jnp.arange(1 << 17) < live_mesh["n_verts"]
    vmask0 = jnp.arange(caps["vert_cap"]) < mesh0["n_verts"]
    nbr0 = WF.neighbor_lookup(wf0, mesh0["verts"], hyper["knn_k"])

    @jax.jit
    def track_energy(node_dq, lw_dq):
        wfx = wf0.replace(node_dq=node_dq)
        from dynamicfusion_body_tpu.pipeline.frame import _blend_weights
        bw = _blend_weights(wfx, mesh0["verts"], nbr0)
        wv, wn = WF.warp_points(
            wfx, mesh0["verts"], nbr0, normals=mesh0["normals"], m_lw=lw_dq
        )
        corr, cval, _ = closest_point_correspondences(
            wv, wn, vmask0, live_mesh["verts"], lmask, hyper["knn_k"],
            hyper["tolerance"], approx=False,
        )
        data_args = (mesh0["verts"], mesh0["normals"], corr, cval, nbr0, bw)
        P = 8
        reg_args = (jnp.zeros(P, jnp.int32), jnp.zeros(P, jnp.int32),
                    jnp.zeros((P, 3), jnp.float32), jnp.zeros(P, jnp.float32),
                    jnp.zeros(P, bool))
        r_d, r_r = NR._residuals(node_dq, data_args, reg_args, lw_dq)
        raw, rob = NR._energies(r_d, r_r, lambda x: x)
        return raw, rob, jnp.sum(cval.astype(jnp.int32))

    arms = [
        ("fast", {}),
        ("exact(all)", dict(cg_iters=32, approx_knn=False,
                            reuse_corr=False, exact_candidates=True)),
        ("fast+cg32", dict(cg_iters=32)),
        ("fast+exact_knn", dict(approx_knn=False)),
        ("fast+fresh_corr", dict(reuse_corr=False)),
        ("fast+flat_cand", dict(exact_candidates=True)),
        ("exact-cg16", dict(approx_knn=False, reuse_corr=False,
                            exact_candidates=True)),
    ]
    raw0, rob0, nc0 = track_energy(wf0.node_dq, lw0)
    print(f"# pre-solve tracking energy raw={float(raw0):.2f} "
          f"huber={float(rob0):.2f} ncorr={int(nc0)}", flush=True)

    results = {}
    for name, over in arms:
        h = dict(hyper)
        h.update(over)
        if "exact_candidates" in over:
            # caches baked into mesh0 are 2-level; drop them so the arm
            # really recomputes flat candidates
            m0 = {k: v for k, v in mesh0.items()
                  if not k.startswith(("brick_", "warp_"))}
        else:
            m0 = mesh0
        out = fusion_frame(values0, weights0, live0, wf0, lw0,
                           canon_mesh=m0, update_graph=False, **h)
        st = out[4]
        cas = np.asarray(st.cost_after)
        idx = int(np.max(np.where(cas > 0, np.arange(len(cas)), 0)))
        ca = float(cas[idx])
        raw, rob, nc = track_energy(out[2].node_dq, out[3])
        results[name] = (ca, float(rob), float(raw), int(nc))
        print(f"{name:18s} in-frame final cost {ca:8.3f}   "
              f"common-obj huber {float(rob):8.3f} raw {float(raw):8.3f} "
              f"ncorr {int(nc)}", flush=True)

    ca_e = results["exact(all)"][0]
    rob_e = results["exact(all)"][1]
    print("\n# ratios vs exact(all):", flush=True)
    for name, (ca, rob, raw, nc) in results.items():
        print(f"{name:18s} in-frame {ca / max(ca_e, 1e-30):6.3f}   "
              f"common-obj {rob / max(rob_e, 1e-30):6.3f}", flush=True)


if __name__ == "__main__":
    main()
