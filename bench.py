"""Headline benchmark: updateTSDF + warp-field solve per frame at 256³.

Mirrors the reference's profiled TEST_FUSION flow (test.py:104-138): a
canonical SDF volume, a deformed live SDF volume, closest-point
correspondences, then per frame ``solve`` (rigid presolve + non-rigid GN
with correspondence refresh) and ``updateTSDF`` (DQB warp of every voxel +
trilerp fusion) — at 256³ instead of the reference's 65³.

Baseline (BASELINE.md): the reference prototype needs ≈ 380 s (best case,
solve 74.1 s + updateTSDF 306 s... best combined frame ≈ 380 s) per frame
at 65³ = 1/64 the voxels on a lab CPU. vs_baseline reported here is the
UNSCALED conservative speedup: reference_best_ms_at_65³ / ours_ms_at_256³.

Prints exactly one JSON line:
  {"metric": "frame_ms_256", "value": <ms>, "unit": "ms/frame",
   "vs_baseline": <speedup>}
"""

import json
import sys
import time

import numpy as np


RES = 256
REFERENCE_BEST_COMBINED_MS = 380_100.0  # best frame at 65^3 (BASELINE.md)


def sphere_sdf(res, center, radius):
    g = np.arange(res, dtype=np.float32)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    return (
        np.sqrt((x - center[0]) ** 2 + (y - center[1]) ** 2 + (z - center[2]) ** 2)
        - radius
    ).astype(np.float32)


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
    import jax

    from dynamicfusion_body_tpu import Fusion

    t_setup = time.time()
    canonical = bumpy_sdf(RES, (128, 128, 128), 70.0, 4.0, 3.0, 0.0)
    live = bumpy_sdf(RES, (130, 129, 128), 70.0, 4.0, 3.0, 0.35)

    fus = Fusion(
        canonical,
        float(canonical.max()),
        subsample_rate=1.5,
        knn=3,
        marching_cubes_step_size=2,
        vert_cap=1 << 17,
        face_cap=1 << 18,
        node_cap=4096,
        write_warpfield=False,
    )
    n_nodes = int(fus._warp.num_active)
    print(
        f"# setup {time.time()-t_setup:.1f}s: mesh verts="
        f"{int(fus._mesh['n_verts'])} nodes={n_nodes} backend={jax.default_backend()}",
        file=sys.stderr,
    )

    def frame():
        fus.setupCorrespondences(live, method="clpts")
        fus.solve(regularization_weight=0.5, method="clpts")
        fus.updateTSDF()

    # warmup (compile)
    t0 = time.time()
    frame()
    print(f"# warmup frame {time.time()-t0:.1f}s", file=sys.stderr)

    # steady state
    times = []
    for _ in range(3):
        t0 = time.time()
        frame()
        jax.block_until_ready(fus.volume.values)
        times.append(time.time() - t0)
    ms = float(np.median(times) * 1000.0)
    print(f"# steady frames (ms): {[round(t*1000,1) for t in times]}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "frame_ms_256",
                "value": round(ms, 2),
                "unit": "ms/frame",
                "vs_baseline": round(REFERENCE_BEST_COMBINED_MS / ms, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
