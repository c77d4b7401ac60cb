"""Round-5 IN-FRAME stage attribution: time the fused frame with stages
toggled, instead of standalone kernels (tools/profile_frame.py) — XLA
fuses/overlaps differently inside the one-program frame, so standalone
numbers under-account (round-5: ~480 ms of standalone stages vs 617 ms
measured frame).

Each arm runs bench.py's exact 6-frame amortized chain with ONE knob
changed; the delta vs base attributes that stage's true in-frame cost.

Run: nohup python tools/profile_frame5.py > /tmp/profile_frame5.txt 2>&1 &

Round-5 measurement (v5e, 256³, bench knobs gn6/cg12):

    base (bench knobs gn6cg12)      575.3 ms/frame
    solve_iters=0 (no solve)        264.0
    solve_iters=1                   420.0
    gn_iters=1 (3 rounds x 1)       522.0
    update_graph=False              588.0   (≈ noise: removing the
                                             graph update didn't help)
    reuse_corr off (fresh rounds)   482.8   ← fresh full search per
                                             round BEATS the cached-
                                             candidate + certificate
                                             machinery by 93 ms
    exact_candidates                610.4
    cg_iters=6                      550.4

Reading: the GN marginal cost is ~3.5 ms/iter (15 extra iters cost
53 ms — the JᵀWJ freeze works) and the CG marginal ~0.23 ms/iter; the
solve's ~311 ms is dominated by PER-ROUND FIXED cost, most of it the
cached-candidate re-rank + drift-certificate + lax.cond(refresh)
machinery, which in-frame costs more than the fresh bf16 top-k search
it was built to avoid (the frame-entry candidate build it needs is
itself ~60 ms, and steady state still refreshes ~1 round/frame).
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
    from dynamicfusion_body_tpu.ops.trilerp_pallas import (
        trilerp_bricks_supported,
    )
    from dynamicfusion_body_tpu.pipeline.frame import (
        fusion_frame, init_canonical,
    )

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
    base = dict(
        regularization_weight=0.5, knn_k=3, tdist=tdist, mc_step=2,
        solve_iters=3, gn_iters=6, cg_iters=12, tolerance=5.0,
        n_candidates=16, approx_knn=True,
        use_pallas=trilerp_bricks_supported((RES,) * 3, 8),
        **caps, **live_caps,
    )
    print(f"# setup {time.time()-t0:.0f}s", flush=True)

    def measure(label, **over):
        hyper = dict(base, **over)

        def frame(values, weights, wf, lw, live, mesh):
            return fusion_frame(values, weights, live, wf, lw,
                                canon_mesh=mesh, **hyper)

        def fetch(out):
            # forces the frame's full dependency chain; cost_after is
            # empty when solve_iters=0, so sync on the fused volume and
            # the post-update mesh (the two terminal stages).
            _ = float(out[0][0, 0, 0])
            _ = float(out[5]["verts"][0, 0])

        t0 = time.time()
        out = frame(values, weights, wf, lw, lives[0], None)
        fetch(out)
        out = frame(out[0], out[1], out[2], out[3], lives[0], out[5])
        fetch(out)
        t_compile = time.time() - t0
        state0 = (*out[:4], out[5])

        def run_chain(state, frames):
            v, w, wf_, lw_, mesh = state
            for live in frames:
                v, w, wf_, lw_, stats, mesh = frame(v, w, wf_, lw_, live,
                                                    mesh)
            _ = float(v[0, 0, 0])
            _ = float(mesh["verts"][0, 0])
            return (v, w, wf_, lw_, mesh)

        run_chain(state0, lives[:1])
        t0 = time.time()
        run_chain(state0, lives[:1])
        t1 = time.time() - t0
        t0 = time.time()
        run_chain(state0, lives)
        tk = time.time() - t0
        ms = (tk - t1) / (len(lives) - 1) * 1000.0
        print(f"{label:34s} {ms:7.1f} ms/frame  (compile {t_compile:.0f}s)",
              flush=True)
        return ms

    base_ms = measure("base (bench knobs gn6cg12)")
    measure("solve_iters=0 (no solve)", solve_iters=0)
    measure("solve_iters=1", solve_iters=1)
    measure("gn_iters=1 (3 rounds x 1)", gn_iters=1)
    measure("update_graph=False", update_graph=False)
    measure("reuse_corr off (fresh rounds)", reuse_corr=False)
    measure("exact_candidates", exact_candidates=True)
    measure("cg_iters=6", cg_iters=6)
    print(f"# base {base_ms:.1f}", flush=True)


if __name__ == "__main__":
    main()
