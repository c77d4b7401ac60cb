"""Generate marching-cubes triangulation tables from first principles.

Construction: for each of the 256 corner-sign cases, crossing points live
on cube edges; on every cube face, crossing points are paired by segments
that separate inside (negative) corners from outside corners, with the
fixed ambiguity rule "segments hug inside corners" (the same rule seen from
both cells sharing a face → watertight across cells). The segments close
into loops, each loop is fan-triangulated, and triangles are oriented so
their normals point from inside (value < level) to outside.

Conventions (must match ops/marching_cubes.py):
* corner b ∈ [0,8): offset = (b&1, (b>>1)&1, (b>>2)&1) — bit0→x, bit1→y,
  bit2→z;
* case bit b is set iff corner value < level (inside);
* local edge id = axis*4 + rank, axis ∈ {x=0,y=1,z=2}; rank indexes the 4
  parallel edges in increasing base-corner order:
  x: bases (0,2,4,6), y: bases (0,1,4,5), z: bases (0,1,2,3).

Emits dynamicfusion_body_tpu/ops/mc_tables.py with:
  TRI_TABLE   (256, 5, 3) int32, local edge ids, -1 padded
  TRI_COUNT   (256,) int32
  EDGE_BASE   (12,) int32  — base-corner index of each local edge
  EDGE_AXIS   (12,) int32  — axis of each local edge

Run: python tools/gen_mc_tables.py
"""

import itertools
import os

import numpy as np

CORNER_OFFSETS = np.array(
    [[(b >> a) & 1 for a in range(3)] for b in range(8)], dtype=np.int32
)

# local edges: (base corner, axis), id = axis*4 + rank
EDGES = []
for axis in range(3):
    bit = 1 << axis
    bases = [b for b in range(8) if not (b & bit)]
    for b in bases:
        EDGES.append((b, axis))
EDGE_OF = {(b, a): i for i, (b, a) in enumerate(EDGES)}

# 6 faces: (fixed axis, fixed value) with their 4 corners in cyclic order
FACES = []
for axis in range(3):
    for val in (0, 1):
        corners = [b for b in range(8) if ((b >> axis) & 1) == val]
        # order cyclically around the face using the two free axes
        a1, a2 = [a for a in range(3) if a != axis]
        def key(b):
            return (((b >> a1) & 1), ((b >> a2) & 1))
        ordered = sorted(corners, key=key)
        # sorted gives (0,0),(0,1),(1,0),(1,1) → reorder to cycle
        cyc = [ordered[0], ordered[1], ordered[3], ordered[2]]
        FACES.append(cyc)


def face_edges(cyc):
    """The 4 edges of a face as (corner_a, corner_b) canonical pairs, in
    cyclic order."""
    out = []
    for i in range(4):
        a, b = cyc[i], cyc[(i + 1) % 4]
        axis = (a ^ b).bit_length() - 1
        base = min(a, b)
        out.append(EDGE_OF[(base, axis)])
    return out


def build_case(case):
    inside = [(case >> b) & 1 == 1 for b in range(8)]
    crossing = set()
    for eid, (b, axis) in enumerate(EDGES):
        b2 = b | (1 << axis)
        if inside[b] != inside[b2]:
            crossing.add(eid)
    if not crossing:
        return []

    # segments on faces
    segs = []
    for cyc in FACES:
        eids = face_edges(cyc)
        cross = [e for e in eids if e in crossing]
        if len(cross) == 0:
            continue
        if len(cross) == 2:
            segs.append(tuple(cross))
        elif len(cross) == 4:
            # ambiguous face: hug the inside corners. For each inside corner
            # on this face, connect the two crossing edges incident to it.
            for i, c in enumerate(cyc):
                if inside[c]:
                    e_prev = eids[(i - 1) % 4]
                    e_next = eids[i]
                    # both must be crossing (corner inside, neighbors outside
                    # in the ambiguous config)
                    if e_prev in crossing and e_next in crossing:
                        segs.append((e_prev, e_next))
        else:
            raise AssertionError("odd crossing count on a face")

    # build loops: each crossing edge appears in exactly 2 segments
    adj = {}
    for a, b in segs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    for e, ns in adj.items():
        assert len(ns) == 2, (case, e, ns)

    loops = []
    unused = set(crossing)
    while unused:
        start = min(unused)
        loop = [start]
        unused.discard(start)
        prev, cur = None, start
        while True:
            nxt = [n for n in adj[cur] if n != prev]
            # when both neighbors equal prev (2-loop) pick the other entry
            if not nxt:
                nxt = [n for n in adj[cur]]
            n = nxt[0]
            if n == start:
                break
            loop.append(n)
            unused.discard(n)
            prev, cur = cur, n
        assert len(loop) >= 3, (case, loop)
        loops.append(loop)

    # crossing point position per edge (midpoint — only orientation matters)
    def epos(eid):
        b, axis = EDGES[eid]
        p = CORNER_OFFSETS[b].astype(float).copy()
        p[axis] += 0.5
        return p

    ins_pts = CORNER_OFFSETS[[b for b in range(8) if inside[b]]].astype(float)
    out_pts = CORNER_OFFSETS[[b for b in range(8) if not inside[b]]].astype(float)

    tris = []
    for loop in loops:
        pts = [epos(e) for e in loop]
        centroid = np.mean(pts, axis=0)
        # Newell normal of the polygon
        nrm = np.zeros(3)
        for i in range(len(pts)):
            p, q = pts[i], pts[(i + 1) % len(pts)]
            nrm += np.cross(p - centroid, q - centroid)
        # orient to agree with the 'descent' vertex-normal convention
        # (normals = -gradient, pointing toward the inside/negative side):
        # triangle normal points from outside toward inside.
        ref = np.mean(out_pts, axis=0) - np.mean(ins_pts, axis=0)
        order = loop if nrm @ ref < 0 else loop[::-1]
        for i in range(1, len(order) - 1):
            tris.append((order[0], order[i], order[i + 1]))
    assert len(tris) <= 5, (case, len(tris))
    return tris


def main():
    tri_table = np.full((256, 5, 3), -1, dtype=np.int32)
    tri_count = np.zeros(256, dtype=np.int32)
    for case in range(256):
        tris = build_case(case)
        tri_count[case] = len(tris)
        for i, t in enumerate(tris):
            tri_table[case, i] = t

    edge_base = np.array([b for b, _ in EDGES], dtype=np.int32)
    edge_axis = np.array([a for _, a in EDGES], dtype=np.int32)

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "dynamicfusion_body_tpu", "ops", "mc_tables.py",
    )
    with open(out, "w") as f:
        f.write('"""Marching-cubes tables. GENERATED by tools/gen_mc_tables.py'
                ' — do not edit."""\n\nimport numpy as np\n\n')
        f.write("TRI_TABLE = np.array(%r, dtype=np.int32).reshape(256, 5, 3)\n"
                % tri_table.reshape(-1).tolist())
        f.write("TRI_COUNT = np.array(%r, dtype=np.int32)\n"
                % tri_count.tolist())
        f.write("EDGE_BASE = np.array(%r, dtype=np.int32)\n"
                % edge_base.tolist())
        f.write("EDGE_AXIS = np.array(%r, dtype=np.int32)\n"
                % edge_axis.tolist())
    print("max tris in a case:", tri_count.max())
    print("wrote", out)


if __name__ == "__main__":
    main()
