"""Round-5 correspondence-candidate search shootout at bench shapes.

The fused frame pays one full candidate search per frame (kc=16 over
~23k warped canonical verts x ~94k live verts) — 64 ms measured with the
bf16 + hardware-top-k flat path (tools/profile_frame.py). knn_2level
exploits the marching-cubes vertex order's spatial coherence to replace
the (Q, P) distance matrix with per-chunk candidate pools; this times
both at the exact bench shapes and reports the 2-level risk count (pool
misses fold into the bench's corr_risk gate).

Run: nohup python tools/profile_corr5.py > /tmp/profile_corr5.txt 2>&1 &
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
    from dynamicfusion_body_tpu.ops.marching_cubes import marching_cubes
    from dynamicfusion_body_tpu.ops.knn import knn, knn_2level
    from dynamicfusion_body_tpu.pipeline.frame import init_canonical
    from tools.profile_frame import make_timer

    f1, timeit = make_timer(jnp)

    canonical = bumpy_sdf(RES, (128, 128, 128), 70.0, 4.0, 3.0, 0.0)
    live = jnp.asarray(bumpy_sdf(RES, (130, 129, 128), 70.0, 4.0, 3.0, 0.1))
    values = jnp.asarray(canonical)
    caps = dict(vert_cap=1 << 15, face_cap=1 << 16)
    wf, _ = init_canonical(values, subsample_rate=1.5, node_cap=4096,
                           mc_step=2, **caps)
    mc_canon = jax.jit(lambda v: marching_cubes(
        v, 0.0, vert_cap=1 << 15, face_cap=1 << 16, step_size=2))
    mesh = mc_canon(values)
    vmask = jnp.asarray(np.arange(1 << 15) < int(mesh["n_verts"]))
    live_mesh = jax.jit(lambda v: marching_cubes(
        v, 0.0, vert_cap=1 << 17, face_cap=1 << 18, step_size=1,
        with_normals=False))(live)
    lmask = jnp.asarray(np.arange(1 << 17) < int(live_mesh["n_verts"]))
    print(f"# backend={jax.default_backend()} "
          f"V={int(mesh['n_verts'])} L={int(live_mesh['n_verts'])}",
          flush=True)

    q = mesh["verts"]
    p = live_mesh["verts"]
    kc = 16

    hw = jax.jit(lambda: knn(q, p, kc, valid=lmask, approx=True)[1])
    timeit("knn_hw_approx_kc16", hw, lambda o: f1(o))

    exact = jax.jit(lambda: knn(q, p, kc, valid=lmask)[1])
    timeit("knn_exact_kc16", exact, lambda o: f1(o))

    for chunk, pool in ((1024, 4096), (2048, 8192), (1024, 8192),
                        (512, 4096)):
        tl = jax.jit(lambda c=chunk, pl=pool: knn_2level(
            q, p, kc, qvalid=vmask, valid=lmask, chunk=c, pool=pl))
        out = tl()
        risk = int(out[2])
        timeit(f"knn_2lvl_c{chunk}_p{pool} (risk {risk})", tl,
               lambda o: f1(o[0]))

    # agreement of the chosen candidates vs exact (index-set overlap)
    idx_e = np.asarray(exact())
    idx_2 = np.asarray(knn_2level(q, p, kc, qvalid=vmask, valid=lmask)[1])
    vm = np.asarray(vmask)
    same = [
        len(set(idx_e[i]) & set(idx_2[i])) for i in range(len(vm)) if vm[i]
    ]
    print(f"# 2lvl vs exact: mean candidate overlap {np.mean(same):.2f}/"
          f"{kc}, min {np.min(same)}", flush=True)
    idx_h = np.asarray(hw())
    same_h = [
        len(set(idx_e[i]) & set(idx_h[i])) for i in range(len(vm)) if vm[i]
    ]
    print(f"# hw  vs exact: mean candidate overlap {np.mean(same_h):.2f}/"
          f"{kc}, min {np.min(same_h)}", flush=True)


if __name__ == "__main__":
    main()
