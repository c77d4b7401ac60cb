"""Sharded marching cubes == unsharded marching cubes (8-device mesh).

Equivalence contract (parallel/mc_sharded.py): the union of per-device
vertex positions is BIT-IDENTICAL to the single-chip op's vertex set
(seam vertices appear once per adjacent device), the face set — compared
as position triples, since indices differ by construction — is exactly
equal, and normals match at every shared position.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamicfusion_body_tpu.ops.marching_cubes import marching_cubes
from dynamicfusion_body_tpu.parallel.mc_sharded import (
    marching_cubes_sharded,
)
from dynamicfusion_body_tpu.parallel.mesh import (
    VOXEL_AXIS, make_mesh, volume_sharding,
)


def _bumpy(res=64, radius=18.0):
    g = np.arange(res, dtype=np.float32)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    c = res / 2.0
    r = np.sqrt((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2) + 1e-6
    th = np.arccos(np.clip((z - c) / r, -1, 1))
    return (r - radius - 2.0 * np.sin(3 * th)).astype(np.float32)


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


@pytest.mark.parametrize("step", [1, 2])
def test_sharded_mc_matches_single_chip(mesh8, step):
    vol = _bumpy()
    vs = jax.device_put(jnp.asarray(vol), volume_sharding(mesh8))
    ref = marching_cubes(
        jnp.asarray(vol), level=0.0, vert_cap=1 << 14, face_cap=1 << 15,
        step_size=step,
    )
    sh = marching_cubes_sharded(
        mesh8, vert_cap=1 << 12, face_cap=1 << 13, step_size=step
    )(vs)
    assert not bool(sh["overflow"])

    nvr, nfr = int(ref["n_verts"]), int(ref["n_faces"])
    rv = np.asarray(ref["verts"])[:nvr]
    vvalid = np.asarray(sh["vert_valid"])
    sv = np.asarray(sh["verts"])[vvalid]

    # vertex position SETS are bit-identical (seam verts duplicated)
    rset = set(map(tuple, rv))
    sset = set(map(tuple, sv))
    assert rset == sset
    assert int(sh["n_verts"]) >= nvr          # duplicates only add
    assert int(sh["n_faces"]) == nfr          # faces are partitioned

    # the OWNED subset has no duplicates and matches single-chip exactly
    so = np.asarray(sh["verts"])[np.asarray(sh["vert_owned"])]
    assert int(sh["n_owned"]) == nvr == len(so)
    assert set(map(tuple, so)) == rset

    # faces as position triples: exactly equal sets
    tri_r = rv[np.asarray(ref["faces"])[:nfr].reshape(-1)].reshape(-1, 9)
    fs = np.asarray(sh["faces"])[np.asarray(sh["face_valid"])]
    tri_s = np.asarray(sh["verts"])[fs.reshape(-1)].reshape(-1, 9)
    assert set(map(tuple, tri_r)) == set(map(tuple, tri_s))

    # normals agree at every position (boundary planes go through the
    # linear-extrapolation halo — fp-rounding-level differences only)
    pos2n = {tuple(p): n for p, n in zip(rv, np.asarray(ref["normals"])[:nvr])}
    sn = np.asarray(sh["normals"])[vvalid]
    errs = np.array([
        np.abs(pos2n[tuple(p)] - n).max() for p, n in zip(sv, sn)
    ])
    assert errs.max() < 1e-5


def test_sharded_mc_replicated_volume(mesh8):
    """The live-volume mode: volume replicated, extraction compute
    sharded by slab — same equivalence contract, no halo collectives."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from dynamicfusion_body_tpu.parallel.mc_sharded import mc_local_slab

    vol = jnp.asarray(_bumpy())
    vert_cap, face_cap = 1 << 12, 1 << 13

    def local(v):
        m = mc_local_slab(
            v, VOXEL_AXIS, 8, vert_cap=vert_cap, face_cap=face_cap,
            with_normals=False, replicated_vol=True,
        )
        vvalid = jnp.arange(vert_cap) < m["n_verts"]
        return m["verts"], vvalid

    fn = jax.jit(shard_map(
        local, mesh=mesh8, in_specs=(P(),),
        out_specs=(P(VOXEL_AXIS), P(VOXEL_AXIS)),
    ))
    sv, vvalid = fn(vol)
    ref = marching_cubes(
        vol, level=0.0, vert_cap=1 << 14, face_cap=1 << 15,
        with_normals=False,
    )
    rv = np.asarray(ref["verts"])[: int(ref["n_verts"])]
    got = np.asarray(sv)[np.asarray(vvalid)]
    assert set(map(tuple, rv)) == set(map(tuple, got))
