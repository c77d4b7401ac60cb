"""Generate the result/ablation mesh grid the reference ships.

The reference commits result meshes with an ablation README
(/root/reference/meshes/README): the canonical ``original`` plus fusions
under {high regularization, no pruning} / {low regularization, pruning}
× {ICP (closest-point), CNN} correspondences. The reference's input
sequence is not distributed, so this drives the same grid over the
package's synthetic deformable-body sequence (the bench.py body) and
writes the meshes + README to ``meshes/``.

Run: python tools/make_ablation.py [--res 128] [--frames 3]
     [--cnn-weights data/dhbc_synth.npz]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

README = """\
Result meshes from the synthetic deformable-body sequence
(tools/make_ablation.py; analogue of the reference's meshes/README grid).

original.obj                      mesh extracted from the first frame
                                  (canonical)
high_reg_no_pruning_clpts.obj     fused with HIGH regularization weight;
                                  bad closest-point correspondences were
                                  NOT rejected (tolerance prune off)
low_reg_with_pruning_clpts.obj    fused with LOW regularization weight;
                                  bad closest-point correspondences were
                                  rejected (plane-cost tolerance prune)
low_reg_with_pruning_cnn.obj      fused with LOW regularization weight;
                                  correspondences from trained DHBC
                                  descriptors (tools/train_dhbc.py), bad
                                  matches rejected
"""


def run_variant(vols, name, out_dir, reg, prune, method, tdist,
                cnn_weights=None, verbose=False):
    import jax.numpy as jnp

    from dynamicfusion_body_tpu.pipeline.fusion import Fusion

    t0 = time.time()
    fus = Fusion(
        jnp.asarray(vols[0]), tdist, subsample_rate=2.0, knn=3,
        marching_cubes_step_size=1, verbose=verbose,
        use_cnn=(method == "cnn"), cnn_weights=cnn_weights,
        cnn_image_size=64, write_warpfield=False,
    )
    if name == "original":
        fus.write_canonical_mesh(out_dir, "original.obj")
        print(f"# original.obj ({time.time()-t0:.1f}s)", flush=True)
        return
    for i, vol in enumerate(vols[1:], start=1):
        fus.setupCorrespondences(
            jnp.asarray(vol), method=method, prune_result=prune,
            tolerance=0.2 if prune else 1e9,
        )
        fus.solve(regularization_weight=reg, method=method)
        fus.updateTSDF()
        fus.update_graph()
    fus.write_canonical_mesh(out_dir, f"{name}.obj")
    print(f"# {name}.obj ({time.time()-t0:.1f}s)", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--out-dir", default="/root/repo/meshes")
    ap.add_argument("--cnn-weights", default="/root/repo/data/dhbc_synth.npz")
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (axon ignores JAX_PLATFORMS)")
    args = ap.parse_args()

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import bumpy_sdf

    r = args.res
    vols = [
        bumpy_sdf(r, (r / 2 + i, r / 2 + 0.7 * i, r / 2), 0.27 * r,
                  r / 64, 3.0, 0.1 * i)
        for i in range(args.frames + 1)
    ]
    tdist = float(vols[0].max())
    os.makedirs(args.out_dir, exist_ok=True)

    run_variant(vols, "original", args.out_dir, 0.5, True, "clpts", tdist,
                verbose=args.verbose)
    run_variant(vols, "high_reg_no_pruning_clpts", args.out_dir, 5.0,
                False, "clpts", tdist, verbose=args.verbose)
    run_variant(vols, "low_reg_with_pruning_clpts", args.out_dir, 0.5,
                True, "clpts", tdist, verbose=args.verbose)
    cw = args.cnn_weights if os.path.exists(args.cnn_weights) else None
    if cw is None:
        print("# no trained DHBC weights found - skipping the CNN variant "
              "(run tools/train_dhbc.py first)", flush=True)
    else:
        run_variant(vols, "low_reg_with_pruning_cnn", args.out_dir, 0.5,
                    True, "cnn", tdist, cnn_weights=cw,
                    verbose=args.verbose)

    with open(os.path.join(args.out_dir, "README.md"), "w") as f:
        f.write(README)
    print("# wrote", args.out_dir, flush=True)


if __name__ == "__main__":
    main()
