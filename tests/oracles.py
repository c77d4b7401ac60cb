"""Pure-NumPy oracle implementations of the reference math semantics.

These are independent re-derivations of the documented formulas (quaternion
sandwich products via the vector form, trilinear interpolation via corner
weights, greedy radius subsampling) used to validate the JAX/TPU kernels in
dynamicfusion_body_tpu. The behavioral spec is the reference's
core/util.py + core/fusion.py (see file:line citations in each docstring).
"""

import numpy as np


def quat_mul(a, b):
    """(w,x,y,z) Hamilton product via the vector identity."""
    aw, av = a[0], np.asarray(a[1:], dtype=np.float64)
    bw, bv = b[0], np.asarray(b[1:], dtype=np.float64)
    w = aw * bw - av @ bv
    v = aw * bv + bw * av + np.cross(av, bv)
    return np.concatenate([[w], v])


def dq_mul(a, b):
    rr = quat_mul(a[:4], b[:4])
    rd = quat_mul(a[:4], b[4:]) + quat_mul(a[4:], b[:4])
    return np.concatenate([rr, rd])


def dq_conj_full(q):
    """Negate components 1..4 (combined quaternion+dual conjugate,
    spec: core/util.py:299-304)."""
    s = np.array([1, -1, -1, -1, -1, 1, 1, 1], dtype=np.float64)
    return q * s


def dq_point(dq, p):
    """Sandwich transform, spec core/util.py:68-72 (no normalization)."""
    v = np.array([1, 0, 0, 0, 0, p[0], p[1], p[2]], dtype=np.float64)
    return dq_mul(dq_mul(dq, v), dq_conj_full(dq))[5:]


def dq_normal(dq, n):
    rq = np.concatenate([dq[:4], np.zeros(4)])
    return dq_point(rq, n)


def dq_blend_oracle(pos, node_pos, node_dq, node_w):
    """Gaussian-weighted DQ blend, 8-norm normalized, identity fallback.
    Spec core/fusion.py:527-551."""
    acc = np.zeros(8)
    for v, q, w in zip(node_pos, node_dq, node_w):
        wt = np.exp(-((np.linalg.norm(pos - v) / (2.0 * w)) ** 2))
        acc += wt * np.asarray(q, dtype=np.float64)
    n = np.linalg.norm(acc)
    if n == 0:
        return np.array([1, 0, 0, 0, 0, 0, 0, 0], dtype=np.float64)
    return acc / n


def trilerp_oracle(pos, vol):
    """Spec core/util.py:102-137. Returns None out of bounds."""
    rx, ry, rz = vol.shape
    if min(pos) < 0 or pos[0] > rx - 1 or pos[1] > ry - 1 or pos[2] > rz - 1:
        return None
    lo = np.floor(pos).astype(int)
    hi = np.ceil(pos).astype(int)
    f = pos - lo
    out = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                c = vol[
                    hi[0] if dx else lo[0],
                    hi[1] if dy else lo[1],
                    hi[2] if dz else lo[2],
                ]
                w = (f[0] if dx else 1 - f[0]) * (f[1] if dy else 1 - f[1]) * (
                    f[2] if dz else 1 - f[2]
                )
                out += c * w
    return out


def bilerp_oracle(img, px, py):
    """Spec: the reference OpenCL interpolation helper
    (core/fusion_dm.py:605-622)."""
    x, y = int(np.floor(px)), int(np.floor(py))
    wx, wy = px - x, py - y
    up = img[y, x] * (1 - wx) + img[y, x + 1] * wx
    bot = img[y + 1, x] * (1 - wx) + img[y + 1, x + 1] * wx
    return up * (1 - wy) + bot * wy


def radius_subsample_oracle(points, radius):
    """Greedy first-fit subsample, spec core/util.py:27-47."""
    pts = np.asarray(points, dtype=np.float64)
    remaining = list(range(len(pts)))
    chosen = []
    while remaining:
        i = remaining[0]
        chosen.append(i)
        remaining = [
            j for j in remaining if np.linalg.norm(pts[j] - pts[i]) >= radius
        ]
    return np.array(chosen, dtype=np.int32)


def fuse_depth_oracle(tsdf, tsdf_w, depth, proj, Kinv, tdist, wmax):
    """Per-voxel projective TSDF update — spec: the reference OpenCL kernel
    (core/fusion_dm.py:630-673), re-derived as a straightforward loop.

    proj: 3x4 = K·lw·IND mapping voxel index (x,y,z,1) to projective pixel
    coords. depth: (H,W) negative-depth map. Returns updated (tsdf, tsdf_w).
    """
    tsdf = tsdf.copy()
    tsdf_w = tsdf_w.copy()
    H, W = depth.shape
    rx, ry, rz = tsdf.shape
    for x in range(rx):
        for y in range(ry):
            for z in range(rz):
                uvw = proj @ np.array([x, y, z, 1.0])
                u, v, w = uvw
                px, py = u / w, v / w
                if px < 0 or py < 0 or px >= W - 1 or py >= H - 1:
                    continue
                pz = -bilerp_oracle(depth, px, py)
                if pz <= tdist:
                    dz = -tdist
                else:
                    c = Kinv[2] @ np.array([px * pz - u, py * pz - v, pz - w])
                    dz = -c
                if dz < tdist:
                    wi = 1.0
                    new_w = min(wi + tsdf_w[x, y, z], wmax)
                    tsdf[x, y, z] = (
                        (new_w - wi) * tsdf[x, y, z] + wi * max(-tdist, dz)
                    ) / new_w
                    tsdf_w[x, y, z] = new_w
    return tsdf, tsdf_w
