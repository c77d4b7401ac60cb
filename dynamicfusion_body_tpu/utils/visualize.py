"""Mesh / TSDF visualization (reference ``visualize``, test.py:24-38).

Renders the level-0 isosurface of a TSDF (or an explicit mesh) as a
matplotlib Poly3DCollection. Matplotlib is imported lazily so headless
pipelines never pay for it; pass ``save_path`` to write a PNG without a
display.
"""

from __future__ import annotations

import numpy as np


def visualize_mesh(verts, faces, save_path=None, show=False, title=None):
    import matplotlib

    if save_path and not show:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from mpl_toolkits.mplot3d.art3d import Poly3DCollection

    verts = np.asarray(verts)
    faces = np.asarray(faces)
    fig = plt.figure(figsize=(10, 10))
    ax = fig.add_subplot(111, projection="3d")
    if len(verts) and len(faces):
        mesh = Poly3DCollection(verts[faces])
        mesh.set_edgecolor("k")
        ax.add_collection3d(mesh)
        lo = verts.min(axis=0)
        hi = verts.max(axis=0)
        ax.set_xlim(lo[0], hi[0])
        ax.set_ylim(lo[1], hi[1])
        ax.set_zlim(lo[2], hi[2])
    else:
        ax.set_title((title or "") + " (empty isosurface)")
    if title:
        ax.set_title(title)
    plt.tight_layout()
    if save_path:
        plt.savefig(save_path, dpi=120)
        plt.close(fig)
    if show:
        plt.show()
    return save_path


def visualize_tsdf(tsdf, level=0.0, step_size=1, save_path=None, show=False,
                   vert_cap=1 << 16, face_cap=1 << 17):
    """Marching-cubes the volume then render (reference passed the TSDF)."""
    import jax.numpy as jnp

    from ..ops.marching_cubes import marching_cubes

    out = marching_cubes(
        jnp.asarray(tsdf), level=level, vert_cap=vert_cap, face_cap=face_cap,
        step_size=step_size,
    )
    nv, nf = int(out["n_verts"]), int(out["n_faces"])
    return visualize_mesh(
        np.asarray(out["verts"])[:nv], np.asarray(out["faces"])[:nf],
        save_path=save_path, show=show,
    )
