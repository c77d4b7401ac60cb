"""Round-5b frame sweep: arbitrary fast-arm overrides vs the PINNED
exact arm, gated from bench.py's OWN gate state (the large-motion
rewind frame).

tools/sweep_solver5.py gated from the 2-warmup state on a small-motion
forward frame — bench.py's gate instead runs from the END of the
6-frame chain back to lives[0] (a 0.25-bump rewind), which is where
shallow schedules actually fail (gn=4 swept 0.919 forward but benched
1.468 on the rewind). This tool replicates the bench protocol:

  1. warmup 2 frames, chain all 6 lives -> rewind state (bench's gate
     state);
  2. pinned exact arm FROM THAT STATE: gn=8 cg=32, exact kNN, fresh
     correspondences, flat candidates, live_mc_step=1;
  3. each fast arm runs one frame from the same state; both warps are
     scored on the common objective (huberized point-plane data cost
     under a fresh exact step-1 correspondence search at the final
     warp) = bench.py gate 2;
  4. timing = bench's amortized 6-frame chain.

Arms are named presets (see ARMS below). Run:
  nohup python tools/sweep_frame5.py fresh sched2 lms2 sched2+lms2 \
      > /tmp/sweep5b.txt 2>&1 &

Round-5 measurement (v5e, 256³; exact arm cost_e=3.822, pre=5124.8;
gate = common-objective ratio on the rewind frame, pass < 1.10):

    si1 (1 round, gn12 cg16)   437.3 ms  ratio 0.863  <- WINNER: best
                                          speed AND best tracking
    fresh (gn6 x3)             483.3 ms  ratio 1.027
    sched2 (gn 8,4,2)          484.7 ms  ratio 0.950
    lms2                       507.1 ms  ratio 2.016  FAIL
    sched2+lms2                508.8 ms  ratio 1.890  FAIL
    cached+sched2              555.2 ms  ratio 0.949
    si2  (2 rounds, gn 10,6)   718.4 ms  ratio 0.886
    si2b (2 rounds, gn 8,8)    743.8 ms  ratio 0.950

Readings: (1) per-round FIXED cost dominates — one deep round beats
every multi-round schedule; (2) half-density live targets (lms2) break
tracking outright; (3) solve_iters=2 chains are anomalously SLOW
(718-744 ms in scanned AND unrolled forms): the higher final reg weight
(one relaxation instead of two) tracks worse over the 6-frame chain,
the fused canonical surface bloats, and every later frame pays for the
extra verts; (4) one deep round at rw=0.5 scores BETTER on the common
objective than the 3-round relaxed-reg exact arm — on this scale of
motion the relaxation schedule is a cost, not a benefit, and the bench
gate (which re-checks this every run) is the guard if that ever flips.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# fast-arm override presets (applied on top of the bench hyper)
ARMS = {
    # current bench knobs (cached candidates + certificate refresh)
    "cached": dict(),
    # fresh full (hardware-approx) search every round — the round-5
    # in-frame profile measured this BEATING the cached machinery
    "fresh": dict(reuse_corr=False),
    "fresh_gn4": dict(reuse_corr=False, gn_iters=4),
    # deep-first schedules (total 14 GN vs uniform 18)
    "sched2": dict(reuse_corr=False, gn_iters=(8, 4, 2)),
    "sched3": dict(reuse_corr=False, gn_iters=(6, 3, 2),
                   cg_iters=(16, 12, 8)),
    # half-density live target surface (exact arm stays step 1)
    "lms2": dict(reuse_corr=False, live_mc_step=2),
    "sched2+lms2": dict(reuse_corr=False, gn_iters=(8, 4, 2),
                        live_mc_step=2),
    "cached+sched2": dict(gn_iters=(8, 4, 2)),
    # two relaxation rounds: removes one round's FIXED cost (the round-5
    # in-frame attribution measured ~78 ms/round fixed) — the question
    # is whether the rewind-frame gate holds with only one reg
    # relaxation (rw 0.5 -> 0.0625 instead of -> 0.0078)
    "si2": dict(reuse_corr=False, solve_iters=2, gn_iters=(10, 6),
                cg_iters=(16, 12)),
    "si2b": dict(reuse_corr=False, solve_iters=2, gn_iters=(8, 8)),
    "si1": dict(reuse_corr=False, solve_iters=1, gn_iters=12,
                cg_iters=16),
}


def main():
    names = sys.argv[1:] or ["fresh", "sched2", "lms2", "sched2+lms2"]

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
    from dynamicfusion_body_tpu.solvers import nonrigid as NR

    t0 = time.time()
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

    base_hyper = dict(
        regularization_weight=0.5, knn_k=3, tdist=tdist, mc_step=2,
        solve_iters=3, gn_iters=6, cg_iters=12, tolerance=5.0,
        n_candidates=16, approx_knn=True,
        use_pallas=trilerp_bricks_supported((RES,) * 3, 8),
        **caps, **live_caps,
    )

    # warmup + full chain -> bench's gate state (the rewind state)
    out = fusion_frame(values, weights, lives[0], wf, lw, canon_mesh=None,
                       **base_hyper)
    _ = float(out[4].cost_after[-1])
    out = fusion_frame(out[0], out[1], lives[0], out[2], out[3],
                       canon_mesh=out[5], **base_hyper)
    _ = float(out[4].cost_after[-1])
    state0 = (*out[:4], out[5])
    for live in lives:
        out = fusion_frame(out[0], out[1], live, out[2], out[3],
                           canon_mesh=out[5], **base_hyper)
    _ = float(out[4].cost_after[-1])
    values0, weights0, wf0, lw0, mesh0 = (*out[:4], out[5])
    print(f"# setup+chain {time.time()-t0:.0f}s (gate = rewind from "
          f"live[5] to live[0])", flush=True)

    # ---- common-objective scorer (bench.py gate 2) at the gate state
    live_mesh = marching_cubes(
        lives[0], level=0.0, vert_cap=live_caps["live_vert_cap"],
        face_cap=live_caps["live_face_cap"], step_size=1,
        with_normals=False,
    )
    lmask = jnp.arange(live_caps["live_vert_cap"]) < live_mesh["n_verts"]
    vmask0 = jnp.arange(caps["vert_cap"]) < mesh0["n_verts"]
    nbr0 = WF.neighbor_lookup(wf0, mesh0["verts"], base_hyper["knn_k"])

    @jax.jit
    def track_energy(node_dq, lw_dq):
        wfx = wf0.replace(node_dq=node_dq)
        bw = _blend_weights(wfx, mesh0["verts"], nbr0)
        wv, wn = WF.warp_points(
            wfx, mesh0["verts"], nbr0, normals=mesh0["normals"], m_lw=lw_dq
        )
        corr, cval, _ = closest_point_correspondences(
            wv, wn, vmask0, live_mesh["verts"], lmask,
            base_hyper["knn_k"], base_hyper["tolerance"], approx=False,
        )
        data_args = (mesh0["verts"], mesh0["normals"], corr, cval, nbr0,
                     bw)
        P = 8
        reg_args = (jnp.zeros(P, jnp.int32), jnp.zeros(P, jnp.int32),
                    jnp.zeros((P, 3), jnp.float32),
                    jnp.zeros(P, jnp.float32), jnp.zeros(P, bool))
        r_d, r_r = NR._residuals(node_dq, data_args, reg_args, lw_dq)
        _, rob = NR._energies(r_d, r_r, lambda x: x)
        return rob

    # ---- PINNED exact arm from the gate state
    exact_hyper = dict(base_hyper, gn_iters=8, cg_iters=32,
                       approx_knn=False, use_grid_corr=False,
                       reuse_corr=False, exact_candidates=True,
                       live_mc_step=1)
    t0 = time.time()
    out_e = fusion_frame(values0, weights0, lives[0], wf0, lw0,
                         canon_mesh=mesh0, **exact_hyper)
    cost_e = float(track_energy(out_e[2].node_dq, out_e[3]))
    cost_pre = float(track_energy(wf0.node_dq, lw0))
    print(f"# exact arm {time.time()-t0:.0f}s cost_e={cost_e:.3f} "
          f"pre={cost_pre:.1f}", flush=True)

    for name in names:
        hyper = dict(base_hyper, **ARMS[name])

        def frame(values, weights, wf, lw, live, mesh):
            return fusion_frame(values, weights, live, wf, lw,
                                canon_mesh=mesh, **hyper)

        # gate first (one frame from the rewind state)
        t0 = time.time()
        out_f = frame(values0, weights0, wf0, lw0, lives[0], mesh0)
        cost_f = float(track_energy(out_f[2].node_dq, out_f[3]))
        t_compile = time.time() - t0

        def run_chain(state, frames):
            values, weights, wf, lw, mesh = state
            for live in frames:
                values, weights, wf, lw, stats, mesh = frame(
                    values, weights, wf, lw, live, mesh
                )
            _ = float(stats.cost_after[-1])
            return (values, weights, wf, lw, mesh)

        state = run_chain(state0, lives[:1])  # warm this arm's program
        t0 = time.time()
        state = run_chain(state0, lives[:1])
        t1 = time.time() - t0
        t0 = time.time()
        state = run_chain(state0, lives)
        tk = time.time() - t0
        ms = (tk - t1) / (len(lives) - 1) * 1000.0
        ratio = cost_f / max(cost_e, 1e-30)
        slack = (cost_f - cost_e) / max(cost_pre, 1e-30)
        print(f"{name:16s} {ms:7.1f} ms/frame  cost_f={cost_f:.3f} "
              f"ratio={ratio:.3f} slack={slack:.5f} "
              f"(compile+gate {t_compile:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
