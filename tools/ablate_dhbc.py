"""Score saved DHBC weights on the correspondence ablation without
retraining: clpts vs CNN(random) vs CNN(weights) mean 3D match error
under synthetic bends of the reference's result mesh (the same metric
train_dhbc.py --ablate prints).

The net is fully convolutional, so --size may differ from the training
resolution (larger render = more pixels per vertex for the per-vertex
feature average; core/sdf.py:126-150 uses 512 with the reference
checkpoint).

Run: python tools/ablate_dhbc.py --weights data/dhbc_coord.npz \
         --bends 0.7 1.5 3.0 --size 64
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True)
    ap.add_argument("--bends", type=float, nargs="+", default=[0.7, 1.5, 3.0])
    ap.add_argument("--yaw", type=float, default=0.0,
                    help="rigid yaw (rad) composed on each bend — the "
                         "loop-closure / tracking-loss regime")
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from train_dhbc import ablation, body_mesh

    from dynamicfusion_body_tpu.models.dhbc import (
        init_dhbc, load_npz_params, npz_feature_norm,
    )

    verts, faces = body_mesh()
    print(f"# mesh: {len(verts)} verts; weights: {args.weights}", flush=True)
    _, params = init_dhbc(h=args.size, w=args.size)
    params = load_npz_params(params, args.weights)
    fnorm = npz_feature_norm(args.weights)
    for ang in args.bends:
        res = ablation(verts, faces, params, args.size, angle=ang,
                       feature_norm=fnorm, yaw=args.yaw)
        print(f"# ablation at bend={ang} rad, yaw={args.yaw} rad, "
              f"size={args.size} (mean 3D match error, n_valid):")
        for k, v in res.items():
            print(f"#   {k:12s} err={v[0]:.4f} n={v[1]}", flush=True)


if __name__ == "__main__":
    main()
