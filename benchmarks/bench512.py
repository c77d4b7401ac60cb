"""512³ scale benchmark: full non-rigid frames via the multi-dispatch
Fusion driver.

At 512³ (134M voxels, 8× the headline bench) the single-dispatch fused
frame's peak live set thrashes HBM (docs/tpu_kernel_notes.md); the
driver path — separate XLA programs per phase — is the right execution
shape and lands ~4.6 s/frame steady-state on one v5e. The live mesh is
extracted at stride 2 (``live_mc_step=2``) to bound the correspondence
pool; all other semantics match the reference loop.

Run: python benchmarks/bench512.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import bumpy_sdf


def main():
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from dynamicfusion_body_tpu.pipeline.fusion import Fusion

    RES = 512
    t0 = time.time()
    host = [
        bumpy_sdf(RES, (256 + 2 * i, 256 + i, 256), 140.0, 8.0, 3.0,
                  0.1 * i)
        for i in range(4)
    ]
    tdist = float(host[0].max())
    # pre-upload: a 536 MB host->device copy per frame otherwise
    vols = [jnp.asarray(v) for v in host]
    fus = Fusion(
        host[0], tdist, subsample_rate=3.0, knn=3,
        marching_cubes_step_size=4, write_warpfield=False,
        node_cap=8192, vert_cap=1 << 17, face_cap=1 << 18,
    )
    print(f"# setup {time.time()-t0:.1f}s", file=sys.stderr)

    times = []
    for i, vol in enumerate(vols[1:], 1):
        t0 = time.time()
        fus.setupCorrespondences(vol, method="clpts", tolerance=10.0,
                                 live_mc_step=2)
        fus.solve(regularization_weight=0.5, method="clpts")
        fus.updateTSDF()
        fus.update_graph()
        float(jnp.ravel(fus.volume.values)[0])
        dt = time.time() - t0
        print(f"# frame {i}: {dt:.1f}s", file=sys.stderr)
        if i > 1:  # frame 1 pays the compiles
            times.append(dt)

    print(json.dumps({
        "metric": "frame_ms_512",
        "value": round(float(np.median(times) * 1000), 1),
        "unit": "ms/frame",
    }))


if __name__ == "__main__":
    main()
