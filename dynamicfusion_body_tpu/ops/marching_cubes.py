"""Marching cubes on device: static-shape, fixed-capacity, fully jittable.

Replaces the reference's skimage ``marching_cubes_lewiner`` calls
(core/fusion.py:554-568, core/fusion_dm.py:319-331). TPU design:

* **edge-owner vertices** — every lattice edge (i,j,k,axis) owns at most
  one isosurface vertex (linear interpolation of the zero crossing), so
  vertices are deduplicated by construction, exactly like the classic
  shared-vertex MC output;
* **two-stage compaction** — a cumsum ranks surface-crossing edges into a
  fixed-capacity vertex buffer; active cells (0 < case < 255) are
  compacted into a fixed-capacity cell list before triangle emission, so
  the expensive per-triangle work only touches the ~1-2% of cells that
  intersect the surface;
* **static outputs** — (vert_cap,3) vertices / (face_cap,3) faces plus
  counts; downstream consumers mask by count (TPU requires static shapes).

Triangulation tables are generated from first principles by
tools/gen_mc_tables.py (face-walking with a fixed separate-inside-corners
ambiguity rule → watertight across cells).

Normals follow skimage's default ``gradient_direction='descent'``:
the normalized negative gradient of the volume at each vertex.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from functools import partial

from . import mc_tables
from .interp import trilinear
from .search import searchsorted1d

_TRI_TABLE = jnp.asarray(mc_tables.TRI_TABLE)  # (256, 5, 3) local edge ids
_TRI_COUNT = jnp.asarray(mc_tables.TRI_COUNT)  # (256,)
_EDGE_BASE = jnp.asarray(mc_tables.EDGE_BASE)  # (12,) base corner index
_EDGE_AXIS = jnp.asarray(mc_tables.EDGE_AXIS)  # (12,) axis

# corner offset of base corner per local edge, plus its axis, as (12, 4)
_EDGE_OFF = np.zeros((12, 4), dtype=np.int32)
for _e in range(12):
    _b = int(mc_tables.EDGE_BASE[_e])
    _EDGE_OFF[_e, 0] = _b & 1
    _EDGE_OFF[_e, 1] = (_b >> 1) & 1
    _EDGE_OFF[_e, 2] = (_b >> 2) & 1
    _EDGE_OFF[_e, 3] = int(mc_tables.EDGE_AXIS[_e])
_EDGE_OFF = jnp.asarray(_EDGE_OFF)


@partial(
    jax.jit,
    static_argnames=("vert_cap", "face_cap", "cell_cap", "step_size"),
)
def marching_cubes(
    vol: jax.Array,
    level: float = 0.0,
    vert_cap: int = 65536,
    face_cap: int = 131072,
    cell_cap: int | None = None,
    step_size: int = 1,
):
    """Extract the ``level`` isosurface of ``vol`` (X,Y,Z).

    Returns dict with:
      verts   (vert_cap, 3) f32 — lattice coordinates (scaled by step_size)
      normals (vert_cap, 3) f32 — normalized -gradient (descent direction)
      values  (vert_cap,)  f32 — trilerped volume value at the vertex
      faces   (face_cap, 3) i32 — vertex indices, CCW seen from outside
      n_verts, n_faces      i32 — valid counts (capacity overflow ⇒ count
                                  saturates at capacity; callers may check)
    Counts are exact; slots >= count are zero-filled.
    """
    if step_size > 1:
        vol = vol[::step_size, ::step_size, ::step_size]
    X, Y, Z = vol.shape
    if cell_cap is None:
        cell_cap = face_cap
    inside = vol < level

    # ---- vertices on crossing edges -------------------------------------
    # mask/t over the full (X,Y,Z,3) edge lattice; axis-a edges at index
    # i are valid only when i < dim-1.
    def axis_cross(a):
        sl_lo = [slice(None)] * 3
        sl_hi = [slice(None)] * 3
        sl_lo[a] = slice(0, vol.shape[a] - 1)
        sl_hi[a] = slice(1, vol.shape[a])
        lo = vol[tuple(sl_lo)]
        hi = vol[tuple(sl_hi)]
        cross = (lo < level) != (hi < level)
        denom = lo - hi
        t = jnp.where(jnp.abs(denom) > 1e-30, (lo - level) / denom, 0.5)
        pad = [(0, 0)] * 3
        pad[a] = (0, 1)
        return (
            jnp.pad(cross, pad),
            jnp.pad(jnp.where(cross, t, 0.0), pad),
        )

    # TPU layout note: the edge lattice is kept as 1-D axis-major arrays —
    # edge id = a·XYZ + ((i·Y + j)·Z + k). Any (…,3) trailing dim on the
    # 3·XYZ-sized arrays would pad to the (8,128) tile (42× HBM).
    #
    # Compaction note: TPU scatters are near-serial, so compaction is done
    # with GATHERS — for output slot r, binary-search (searchsorted) the
    # inclusive cumsum of the mask for the r-th set element, then gather.
    crosses, ts = zip(*(axis_cross(a) for a in range(3)))
    nxyz = X * Y * Z

    flat_mask = jnp.concatenate([c.reshape(-1) for c in crosses])
    csum = jnp.cumsum(flat_mask.astype(jnp.int32))  # inclusive
    rank = csum - 1  # rank per edge (valid where mask)
    n_verts = csum[-1]

    # vertex r ← edge index e(r) = first position with csum == r+1
    vslots = jnp.arange(vert_cap, dtype=jnp.int32)
    edge_of_vert = searchsorted1d(csum, vslots + 1, side="left")
    edge_of_vert = jnp.minimum(edge_of_vert, 3 * nxyz - 1)
    vmask0 = vslots < n_verts

    ea = edge_of_vert // nxyz  # axis of each vertex's edge
    elin = edge_of_vert % nxyz
    ei = (elin // (Y * Z)).astype(jnp.float32)
    ej = ((elin // Z) % Y).astype(jnp.float32)
    ek = (elin % Z).astype(jnp.float32)
    t_all = jnp.concatenate([t.reshape(-1) for t in ts])
    et = jnp.take(t_all, edge_of_vert, axis=0)
    vx = ei + jnp.where(ea == 0, et, 0.0)
    vy = ej + jnp.where(ea == 1, et, 0.0)
    vz = ek + jnp.where(ea == 2, et, 0.0)
    verts = jnp.stack(
        [jnp.where(vmask0, c, 0.0) for c in (vx, vy, vz)], axis=-1
    )

    # ---- cell cases + active-cell compaction ----------------------------
    cx, cy, cz = X - 1, Y - 1, Z - 1
    case = jnp.zeros((cx, cy, cz), jnp.int32)
    for b in range(8):
        dx, dy, dz = b & 1, (b >> 1) & 1, (b >> 2) & 1
        case = case | (
            inside[dx : dx + cx, dy : dy + cy, dz : dz + cz].astype(jnp.int32)
            << b
        )
    case_flat = case.reshape(-1)
    ntris = jnp.take(_TRI_COUNT, case_flat, axis=0)
    # cumulative triangle count over ALL cells (in cell order): face r maps
    # straight to its cell by binary search — no intermediate compaction.
    tsum = jnp.cumsum(ntris)  # inclusive
    n_faces = tsum[-1]

    # ---- triangle emission (gather-only) ----------------------------------
    fslots = jnp.arange(face_cap, dtype=jnp.int32)
    cell_of_face = searchsorted1d(tsum, fslots + 1, side="left")
    cell_of_face = jnp.minimum(cell_of_face, case_flat.shape[0] - 1)
    fmask0 = fslots < n_faces
    slot = fslots - (jnp.take(tsum, cell_of_face, axis=0)
                     - jnp.take(ntris, cell_of_face, axis=0))
    slot = jnp.clip(slot, 0, 4)

    ci = cell_of_face // (cy * cz)
    cj = (cell_of_face // cz) % cy
    ck = cell_of_face % cz
    acase = jnp.take(case_flat, cell_of_face, axis=0)
    tri_flat = _TRI_TABLE.reshape(-1)  # (256·5·3,)
    eoff = [_EDGE_OFF[:, c] for c in range(4)]
    fcols = []
    for c in range(3):
        e_local = jnp.take(tri_flat, acase * 15 + slot * 3 + c, axis=0)
        el = jnp.maximum(e_local, 0)  # -1 padding → any safe index
        gi = ci + jnp.take(eoff[0], el, axis=0)
        gj = cj + jnp.take(eoff[1], el, axis=0)
        gk = ck + jnp.take(eoff[2], el, axis=0)
        ga = jnp.take(eoff[3], el, axis=0)
        eid = ga * nxyz + (gi * Y + gj) * Z + gk
        vidx = jnp.take(rank, eid, axis=0)
        fcols.append(jnp.where(fmask0, vidx, 0))
    faces = jnp.stack(fcols, axis=-1)

    # ---- normals + values ------------------------------------------------
    grad = jnp.stack(jnp.gradient(vol), axis=-1)
    gvals = jnp.stack(
        [trilinear(grad[..., a], verts)[0] for a in range(3)], axis=-1
    )
    nrm = -gvals
    nn = jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    normals = nrm / jnp.maximum(nn, 1e-20)
    values, _ = trilinear(vol, verts)

    if step_size > 1:
        verts = verts * step_size

    vmask = jnp.arange(vert_cap) < n_verts
    verts = jnp.where(vmask[:, None], verts, 0.0)
    normals = jnp.where(vmask[:, None], normals, 0.0)
    values = jnp.where(vmask, values, 0.0)

    return {
        "verts": verts,
        "normals": normals,
        "values": values,
        "faces": faces,
        "n_verts": jnp.minimum(n_verts, vert_cap),
        "n_faces": jnp.minimum(n_faces, face_cap),
    }
