"""CNN correspondence path benchmark (round-4 verdict weak #5: the CNN
mode had zero performance accounting).

Times the full learned setupCorrespondences cost at the reference's
operating point — 24 views × 512², both meshes (canonical + live)
descriptor passes + the feature-space match (core/sdf.py:95-150's 24 GL
renders + sess.runs, twice, plus the kd-tree match) — and the effect of
the DHBC view batch (pipeline/cnn_correspondence._descriptors
``view_batch``): B=1 is the round-4 lax.map-singles behavior, B=8 runs
8 views through the network as one (8,512,512,1) forward.

Timing is amortized over dispatch chains like bench.py (the axon tunnel
costs 50-180 ms per dispatch+fetch round trip).

Prints one JSON line:
  {"metric": "cnn_setup_corr_512", "value": <ms both meshes + match>,
   "unit": "ms", "descriptors_ms_b8": <per mesh>,
   "descriptors_ms_b1": <per mesh>, "batch_speedup": <b1/b8>}

Run: nohup python benchmarks/bench_cnn.py > /tmp/bench_cnn.txt 2>&1 &
"""

import json
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
    from dynamicfusion_body_tpu.ops.marching_cubes import marching_cubes
    from dynamicfusion_body_tpu.pipeline.cnn_correspondence import (
        CnnCorrespondence, _descriptors,
    )

    # reference-scale meshes: canonical at mc_step=2 (~24k verts), live
    # at step 1 (~94k) from the bench volumes
    canonical = jnp.asarray(bumpy_sdf(RES, (128, 128, 128), 70.0, 4.0, 3.0))
    live = jnp.asarray(
        bumpy_sdf(RES, (130, 129, 128), 70.0, 4.0, 3.0, 0.05)
    )
    cmesh = marching_cubes(canonical, level=0.0, vert_cap=1 << 15,
                           face_cap=1 << 16, step_size=2)
    lmesh = marching_cubes(live, level=0.0, vert_cap=1 << 17,
                           face_cap=1 << 18, step_size=1)
    vmask = jnp.arange(1 << 15) < cmesh["n_verts"]
    lmask = jnp.arange(1 << 17) < lmesh["n_verts"]
    print(f"# verts canon={int(cmesh['n_verts'])} live={int(lmesh['n_verts'])} "
          f"backend={jax.default_backend()}", file=sys.stderr)

    cnn = CnnCorrespondence(image_size=512, n_views=24)

    def time_descriptors(view_batch, S, reps=4):
        args = (cnn.params, cmesh["verts"], cmesh["faces"],
                jnp.arange(1 << 16) < cmesh["n_faces"], vmask, cnn.mvps,
                cnn.znear, cnn.zfar)
        kw = dict(h=512, w=512, S=S,
                  normalize_input=cnn.normalize_input,
                  view_batch=view_batch)
        f, cnt = _descriptors(*args, **kw)
        # coverage integrity: fraction of valid verts seen by ≥1 pixel —
        # a too-sparse sample grid (triangle bbox > S px) punches holes
        # and drops vertices from the descriptor average
        cov = float(jnp.sum((cnt > 0) & vmask) / jnp.sum(vmask))
        float(f[0, 0])  # compile + settle
        t0 = time.time()
        f, _ = _descriptors(*args, **kw)
        float(f[0, 0])
        t1 = time.time() - t0
        t0 = time.time()
        for _ in range(reps):
            f, _ = _descriptors(*args, **kw)
        float(f[0, 0])
        tn = time.time() - t0
        return (tn - t1) / (reps - 1) * 1000.0, cov

    ms_b1, _ = time_descriptors(1, 8)
    ms_b8, cov8 = time_descriptors(8, 8)
    ms_s4, cov4 = time_descriptors(8, 4)
    ms_s2, cov2 = time_descriptors(8, 2)
    print(f"# descriptors/mesh: B=1/S=8 {ms_b1:.1f} ms, "
          f"B=8/S=8 {ms_b8:.1f} ms (cov {cov8:.4f}), "
          f"S=4 {ms_s4:.1f} ms (cov {cov4:.4f}), "
          f"S=2 {ms_s2:.1f} ms (cov {cov2:.4f})", file=sys.stderr)

    # full learned setupCorrespondences: both meshes + the match
    def setup_corr():
        return cnn.match(cmesh, lmesh, vmask, lmask)

    c, v = setup_corr()
    float(c[0, 0])
    t0 = time.time()
    c, v = setup_corr()
    float(c[0, 0])
    t1 = time.time() - t0
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        c, v = setup_corr()
    float(c[0, 0])
    tn = time.time() - t0
    full_ms = (tn - t1) / (reps - 1) * 1000.0
    print(f"# full cnn setupCorrespondences: {full_ms:.1f} ms "
          f"(n_matched={int(jnp.sum(v))})", file=sys.stderr)

    print(json.dumps({
        "metric": "cnn_setup_corr_512",
        "value": round(full_ms, 1),
        "unit": "ms",
        "descriptors_ms_b1_s8": round(ms_b1, 1),
        "descriptors_ms_s8": round(ms_b8, 1),
        "descriptors_ms_s4": round(ms_s4, 1),
        "descriptors_ms_s2": round(ms_s2, 1),
        "coverage_s8": round(cov8, 4),
        "coverage_s4": round(cov4, 4),
        "coverage_s2": round(cov2, 4),
        "speedup_vs_round4": round(ms_b1 / max(ms_s4, 1e-9), 2),
    }))


if __name__ == "__main__":
    main()
