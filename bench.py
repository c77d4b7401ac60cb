"""Headline benchmark: updateTSDF + warp-field solve per frame at 256³.

Mirrors the reference's profiled TEST_FUSION flow (test.py:104-138) — a
canonical SDF volume, a deformed live SDF volume, per frame ``solve``
(rigid presolve + non-rigid GN rounds with correspondence refresh and the
regularization relaxation schedule) and ``updateTSDF`` (DQB warp of every
voxel + trilerp fusion) — at 256³ instead of the reference's 65³, plus the
per-frame graph update, correspondence setup, and surface extraction the
reference performed around the profiled region.

The frame runs as ONE fused device program (pipeline/frame.py). Timing is
AMORTIZED over a chain of K dependent frames dispatched back-to-back with
a single completion fetch: the axon tunnel costs 50-180 ms per
dispatch+fetch round trip (measured round 3, tools/profile_frame.py
"tunnel_floor_trivial"), which is harness latency, not device work — a
production driver feeds frames continuously and pays it once. Frames are
genuinely sequential (each consumes the previous TSDF/warp state), so the
chain measures true per-frame device throughput:
    per_frame = (T(K frames + fetch) − T(1 frame + fetch)) / (K − 1).

The run also self-checks accuracy: the throughput approximations
(hardware approx kNN, the one-deep-round gn=12/cg=16 solver schedule,
2-level brick pools) are validated in-run against TWO conservative
exact arms — a matched-depth arm (fresh exact kNN per round,
cg_iters=32, flat per-brick candidates) whose fused TSDF volume must
agree to a small fraction of the truncation band, and a PINNED
scipy-grade arm (3 relaxation rounds, gn=8, cg=32, independent of the
fast knobs)
whose common-objective tracking cost the fast arm must match — plus the
fast arm's own conservative risk certificates, so the headline number
cannot silently come from looser knobs (the JSON line carries the
measured deviations).

Baseline (BASELINE.md): the reference prototype's best combined frame is
~380 s at 65³ (1/64 the voxels) on a lab CPU. vs_baseline here is the
UNSCALED conservative speedup: reference_best_ms_at_65³ / ours_ms_at_256³.

Prints exactly one JSON line:
  {"metric": "frame_ms_256", "value": <ms>, "unit": "ms/frame",
   "vs_baseline": <speedup>}
"""

import json
import os
import sys
import time

import numpy as np

RES = 256
REFERENCE_BEST_COMBINED_MS = 380_100.0  # best frame at 65³ (BASELINE.md)


def bumpy_sdf(res, center, radius, amp, freq, phase=0.0):
    """Sphere with angular bumps — a deformable body stand-in."""
    g = np.arange(res, dtype=np.float32)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    dx, dy, dz = x - center[0], y - center[1], z - center[2]
    r = np.sqrt(dx * dx + dy * dy + dz * dz) + 1e-6
    theta = np.arccos(np.clip(dz / r, -1, 1))
    phi = np.arctan2(dy, dx)
    bump = amp * np.sin(freq * theta + phase) * np.cos(freq * phi + phase)
    return (r - (radius + bump)).astype(np.float32)


def main():
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from dynamicfusion_body_tpu.pipeline.frame import fusion_frame, init_canonical

    t_setup = time.time()
    canonical = bumpy_sdf(RES, (128, 128, 128), 70.0, 4.0, 3.0, 0.0)
    lives = [
        jnp.asarray(bumpy_sdf(RES, (130, 129, 128), 70.0, 4.0, 3.0, 0.05 * i))
        for i in range(1, 7)
    ]
    tdist = float(canonical.max())
    values = jnp.asarray(canonical)
    weights = jnp.zeros_like(values)

    # canonical mesh (step 2) is ~24k verts — keep its cap snug; the live
    # step-1 mesh (~94k verts) gets its own larger cap.
    caps = dict(vert_cap=1 << 15, face_cap=1 << 16)
    live_caps = dict(live_vert_cap=1 << 17, live_face_cap=1 << 18)
    wf, radius = init_canonical(
        values, subsample_rate=1.5, node_cap=4096, mc_step=2, **caps
    )
    n_nodes = int(wf.num_active)
    print(
        f"# setup {time.time()-t_setup:.1f}s nodes={n_nodes} "
        f"backend={jax.default_backend()}",
        file=sys.stderr,
    )

    lw = jnp.array([1, 0, 0, 0, 0, 0.1, 0, 0], jnp.float32)
    from dynamicfusion_body_tpu.ops.trilerp_pallas import (
        trilerp_bricks_supported,
    )

    # Solver schedule per the round-5 frame sweep (tools/sweep_frame5.py,
    # gated on bench's own rewind frame vs the PINNED gn=8/cg=32 exact
    # arm):
    # - fresh correspondence search per relaxation round
    #   (reuse_corr=False): the round-5 in-frame attribution
    #   (tools/profile_frame5.py) measured the cached-candidate re-rank +
    #   drift-certificate machinery costing MORE in-frame than the fresh
    #   bf16 top-k search it avoids (575.3 -> 482.8 ms);
    # - ONE deep round (solve_iters=1, gn=12, cg=16) instead of the
    #   3-round relaxation schedule: the attribution showed the solve is
    #   dominated by PER-ROUND FIXED cost (fresh search + block-ELL
    #   assembly context), not GN depth (~3.5 ms/GN marginal), and the
    #   sweep's rewind gate scored one deep round at ratio 0.863 — the
    #   BEST tracking of every arm tried, at 437.3 ms vs 484.7 for the
    #   best 3-round schedule (8,4,2). The relaxation schedule exists to
    #   escape over-regularized minima; the common-objective gate (fresh
    #   exact correspondences at the final warp, vs the PINNED 3-round
    #   gn=8/cg=32 exact arm) directly measures that and says one round
    #   lands in a better basin here.
    # Rejected by the same sweep: gn=(8,4,2) x3 rounds (484.7 ms, ratio
    # 0.950), fresh uniform 6x3 (483.3, 1.027), live_mc_step=2 (507 ms
    # AND ratio 2.02 — half-density live targets break the rewind gate),
    # cached-candidate machinery (555-575 ms), solve_iters=2 (718-744 ms
    # in both scanned and unrolled forms — 2-round chains grow the
    # fused surface and the whole chain pays for it).
    hyper = dict(
        regularization_weight=0.5, knn_k=3, tdist=tdist, mc_step=2,
        solve_iters=1, gn_iters=12, cg_iters=16, tolerance=5.0,
        reuse_corr=False, n_candidates=16,
        # hardware approx top-k for the frame-entry candidate search.
        # Tried "2level" (chunked candidate pools) here in round 5: the
        # frame REGRESSED 617 → 897 ms — every round tripped the drift-
        # certificate refresh (corr_refresh 3/3) and the degraded
        # matches bloated the fused canonical surface toward the vertex
        # cap (23.5k → 31.8k after two warmups). The pools are built on
        # the live mesh's extraction-order coherence, which the WARPED
        # canonical query order does not share.
        approx_knn=jax.default_backend() == "tpu",
        use_pallas=(jax.default_backend() == "tpu"
                    and trilerp_bricks_supported((RES,) * 3, 8)),
        **caps, **live_caps,
    )

    def frame(values, weights, wf, lw, live, mesh):
        return fusion_frame(values, weights, live, wf, lw,
                            canon_mesh=mesh, **hyper)

    # warmup (compile both variants: first frame computes the canonical
    # mesh in-graph, later frames receive the previous frame's mesh).
    # Guarded: if a fast-path kernel fails on this chip (Mosaic compile
    # or runtime), fall back to the conservative XLA path and still
    # produce a measurement rather than nothing.
    t0 = time.time()
    try:
        out = frame(values, weights, wf, lw, lives[0], None)
        stats = out[4]
        _ = float(stats.cost_after[-1])  # force completion
        out2 = frame(*out[:4], lives[0], out[5])
        _ = float(out2[4].cost_after[-1])
    except Exception as e:  # noqa: BLE001 — any device failure
        print(f"# fast path failed ({type(e).__name__}: {e}); "
              "retrying with conservative knobs", file=sys.stderr)
        hyper.update(use_pallas=False, reuse_corr=False,
                     use_grid_corr=False)
        out = frame(values, weights, wf, lw, lives[0], None)
        stats = out[4]
        _ = float(stats.cost_after[-1])
        out2 = frame(*out[:4], lives[0], out[5])
        _ = float(out2[4].cost_after[-1])
    print(
        f"# warmup frames {time.time()-t0:.1f}s corr={int(stats.n_corr)} "
        f"nodes={int(stats.n_nodes)} verts={int(stats.n_verts)}",
        file=sys.stderr,
    )

    # steady state, amortized: T(1 frame + fetch) vs T(K chained frames +
    # fetch); the difference is pure device time (see module docstring).
    def run_chain(state, frames):
        values, weights, wf, lw, mesh = state
        for live in frames:
            values, weights, wf, lw, stats, mesh = frame(
                values, weights, wf, lw, live, mesh
            )
        _ = float(stats.cost_after[-1])  # one completion fetch
        return (values, weights, wf, lw, mesh), stats

    state = (*out2[:4], out2[5])
    t0 = time.time()
    state, _ = run_chain(state, lives[:1])
    t1 = time.time() - t0
    K = len(lives)
    t0 = time.time()
    state, _ = run_chain(state, lives)
    tk = time.time() - t0
    ms = (tk - t1) / (K - 1) * 1000.0
    print(
        f"# steady: 1+fetch {t1*1000:.1f} ms, {K}+fetch {tk*1000:.1f} ms "
        f"-> {ms:.1f} ms/frame amortized",
        file=sys.stderr,
    )

    # ---- accuracy cross-check: approximation knobs vs the exact path.
    # Same start state, SAME model hyperparameters (tolerance etc.) — the
    # exact arms (fresh exact kNN per solve round, cg_iters=32, flat
    # per-brick node candidates; one matched-depth, one pinned at
    # 3 rounds x gn=8) differ only in the approximations the fast path
    # takes (hardware approx kNN, the one-deep-round schedule, 2-level
    # brick pools), so the headline speed cannot silently come from
    # loosened knobs.
    # Three gates (re-derived round 4, tools/diag_gate.py):
    # 1. surface agreement: p99.9 of |Δtsdf| < 0.5 voxel — sub-voxel
    #    surface position agreement (|∇tsdf| ≈ 1/voxel). Bitwise
    #    trajectory agreement is NOT a meaningful target: even exact-kNN
    #    cached vs fresh correspondences differ ~0.25 here because
    #    slightly different (equally valid) matches steer the nonconvex
    #    GN to slightly different minima.
    # 2. tracking quality on a COMMON objective: each arm's final warp is
    #    scored by the huberized point-plane data cost under a fresh
    #    EXACT correspondence search at that warp. The arms' IN-FRAME
    #    final costs are not comparable — each arm solves its own
    #    correspondence-set objective, so a lower in-frame cost can mean
    #    "easier stale objective", not "better warp" (round-3 weak #2:
    #    the shipped 1.55 in-frame ratio decomposed into cached-corr
    #    reuse 1.555→1.239 and cg16 1.24→1.0, yet on the common
    #    objective fresh-corr+cg16 scored 0.90× the exact arm — the
    #    in-frame gap was objective drift, not tracking quality).
    #    Gate: common-objective ratio < 1.10, with an absolute slack of
    #    1% of the frame's pre-solve huberized tracking energy (matched
    #    units, ADVICE r3) capped at ratio < 2 so gross under-solving
    #    can never pass via slack alone.
    # 3. certificates: the fast arm's own conservative risk counters
    #    (pool_risk: 2-level brick pools; corr_risk: residual cached-
    #    candidate drift after certificate-steered refresh) must stay
    #    within documented bounds — the bench fails if the
    #    approximations it relies on stop certifying.
    # Two exact arms so neither gate can be gamed by the fast knobs:
    # - exact_same shares the fast arm's GN/relaxation schedule and
    #   differs ONLY in the approximations (exact kNN, fresh
    #   correspondences, flat candidates, cg=32) — gate 1 (surface
    #   agreement) isolates approximation error at matched depth.
    # - exact_deep is PINNED at the scipy-grade depth (gn=8, cg=32)
    #   independent of the fast knobs — gate 2 (tracking quality on the
    #   common objective) compares against a fixed-quality reference,
    #   so lowering the fast arm's gn_iters cannot drag the reference
    #   down with it (round-5 sweep design, tools/sweep_solver5.py).
    exact_hyper = dict(hyper)
    exact_hyper.update(cg_iters=32, approx_knn=False, use_grid_corr=False,
                       reuse_corr=False, exact_candidates=True)
    # the deep arm is pinned INCLUDING the relaxation schedule — with the
    # fast arm at solve_iters=1 the reference quality bar must stay the
    # full 3-round scipy-grade trajectory, or lowering the fast arm's
    # schedule would lower the bar with it
    deep_hyper = dict(exact_hyper, gn_iters=8, cg_iters=32, solve_iters=3,
                      live_mc_step=1)
    values0, weights0, wf0, lw0, mesh0 = state

    out_f = fusion_frame(values0, weights0, lives[0], wf0, lw0,
                         canon_mesh=mesh0, **hyper)
    out_e = fusion_frame(values0, weights0, lives[0], wf0, lw0,
                         canon_mesh=mesh0, **exact_hyper)
    out_d = (out_e if deep_hyper == exact_hyper else
             fusion_frame(values0, weights0, lives[0], wf0, lw0,
                          canon_mesh=mesh0, **deep_hyper))
    v_fast, v_exact = out_f[0], out_e[0]

    # common-objective tracking energy (gate 2): huberized point-plane
    # data cost of a warp under fresh EXACT correspondences at that warp
    from dynamicfusion_body_tpu.models import warp_field as WF
    from dynamicfusion_body_tpu.ops.marching_cubes import marching_cubes
    from dynamicfusion_body_tpu.pipeline.correspondence import (
        closest_point_correspondences,
    )
    from dynamicfusion_body_tpu.pipeline.frame import _blend_weights
    from dynamicfusion_body_tpu.solvers import nonrigid as NR

    live_mesh = marching_cubes(
        lives[0], level=0.0, vert_cap=live_caps["live_vert_cap"],
        face_cap=live_caps["live_face_cap"], step_size=1,
        with_normals=False,
    )
    lmask = jnp.arange(live_caps["live_vert_cap"]) < live_mesh["n_verts"]
    vmask0 = jnp.arange(caps["vert_cap"]) < mesh0["n_verts"]
    nbr0 = WF.neighbor_lookup(wf0, mesh0["verts"], hyper["knn_k"])

    @jax.jit
    def track_energy(node_dq, lw_dq):
        wfx = wf0.replace(node_dq=node_dq)
        bw = _blend_weights(wfx, mesh0["verts"], nbr0)
        wv, wn = WF.warp_points(
            wfx, mesh0["verts"], nbr0, normals=mesh0["normals"],
            m_lw=lw_dq,
        )
        corr, cval, _ = closest_point_correspondences(
            wv, wn, vmask0, live_mesh["verts"], lmask, hyper["knn_k"],
            hyper["tolerance"], approx=False,
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

    cost_pre = float(track_energy(wf0.node_dq, lw0))
    cost_f = float(track_energy(out_f[2].node_dq, out_f[3]))
    cost_e = float(track_energy(out_d[2].node_dq, out_d[3]))
    adiff = jnp.abs(v_fast - v_exact)
    dev99 = float(jnp.percentile(adiff, 99.9))
    devmax = float(jnp.max(adiff))
    cost_ratio = cost_f / max(cost_e, 1e-30)
    cost_slack = cost_f - cost_e
    cost_ok = (cost_ratio < 1.10) or (
        (cost_slack <= 0.01 * cost_pre) and (cost_ratio < 2.0)
    )
    # certificate gate (gate 3). pool_risk: voxels within node influence
    # whose 2-level candidate pool could not certify per-voxel equality
    # with the flat search (build_warp_cache pool_ctx docstring) —
    # measured 0.002% of the volume at bench scale (round 4), gated at
    # 0.01%; their aggregate effect is directly bounded by gates 1-2,
    # whose exact arm runs flat candidates. corr_risk: vertices whose
    # cached-candidate correspondence could not certify equality with a
    # fresh search, summed over rounds AFTER certificate-steered refresh
    # (rounds with > CORR_REFRESH_FRAC misses re-search in-graph and
    # contribute 0) — the residual is allowed up to 1% of the canonical
    # mesh (uncertified matches steer the GN exactly like the equally-
    # valid alternative matches in gate 1; gate 2 bounds their aggregate
    # effect on a common objective).
    pool_risk = int(out_f[4].pool_risk)
    corr_risk = int(out_f[4].corr_risk)
    corr_refresh = int(out_f[4].corr_refresh)
    n_verts = max(int(out_f[4].n_verts), 1)
    risk_ok = (pool_risk <= 1e-4 * RES**3) and (corr_risk <= 0.01 * n_verts)
    acc_ok = (dev99 < 0.5) and cost_ok and risk_ok
    print(f"# accuracy: |tsdf_fast - tsdf_exact| p99.9 = {dev99:.4f} "
          f"max = {devmax:.4f}; common-objective cost fast/exact = "
          f"{cost_f:.2f}/{cost_e:.2f} = {cost_ratio:.3f}, pre-solve(h) "
          f"{cost_pre:.1f}, slack {cost_slack:.2f} <= "
          f"{0.01 * cost_pre:.2f}; pool_risk {pool_risk} corr_risk "
          f"{corr_risk}/{n_verts} corr_refresh {corr_refresh} "
          f"({'OK' if acc_ok else 'FAIL'})",
          file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "frame_ms_256",
                "value": round(ms, 2),
                "unit": "ms/frame",
                "vs_baseline": round(REFERENCE_BEST_COMBINED_MS / ms, 1),
                "accuracy_tsdf_dev_p999": round(dev99, 4),
                "accuracy_tsdf_dev_max": round(devmax, 4),
                "accuracy_cost_ratio": round(cost_ratio, 4),
                "accuracy_cost_slack_vs_presolve": round(
                    cost_slack / max(cost_pre, 1e-30), 5
                ),
                "pool_risk": pool_risk,
                "corr_risk": corr_risk,
                "corr_refresh": corr_refresh,
                "accuracy_ok": acc_ok,
            }
        )
    )


if __name__ == "__main__":
    main()
