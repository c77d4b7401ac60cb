"""Pallas-path correctness when the warp escapes the per-brick VMEM box.

The brick-trilerp kernel only sees a (16,24,Z) window of the live volume;
samples inside the live volume but beyond that window used to be silently
skipped (advisor finding). update_tsdf_nonrigid now re-samples them
exactly through the XLA gather path — this test engineers a warp with
> 30 voxels of differential spread inside single bricks and checks the
Pallas(+fixup) result equals the pure-XLA path.
"""

import numpy as np
import jax.numpy as jnp

from dynamicfusion_body_tpu.models import warp_field as W
from dynamicfusion_body_tpu.ops.trilerp_pallas import trilerp_bricks_supported


def _tearing_field():
    """Two adjacent nodes with opposite ±18-voxel translations: voxels a
    couple of voxels apart warp ~30 voxels apart."""
    verts = jnp.asarray(
        np.array([[6.0, 10.0, 60.0], [10.0, 14.0, 60.0]], np.float32)
    )
    wf = W.construct_graph(verts, jnp.float32(1.5), 4)
    dqs = np.tile(np.array([1, 0, 0, 0, 0, 0, 0, 0], np.float32), (4, 1))
    dqs[0, 5:8] = [0.0, 0.0, 9.0]   # t = (0,0,+18)
    dqs[1, 5:8] = [0.0, 0.0, -9.0]  # t = (0,0,-18)
    return wf.replace(node_dq=jnp.asarray(dqs))


def test_escaped_samples_are_resampled_exactly(rng):
    shape = (16, 24, 128)
    assert trilerp_bricks_supported(shape, 8)
    wf = _tearing_field()
    lw = jnp.array([1.0, 0, 0, 0, 0, 0, 0, 0], jnp.float32)
    live = jnp.asarray(rng.uniform(-1, 1, shape).astype(np.float32))
    values = jnp.asarray(rng.uniform(-0.2, 0.3, shape).astype(np.float32))
    weights = jnp.asarray((rng.rand(*shape) * 3).astype(np.float32))

    # sanity: the warp really does spread beyond the 16-wide box inside
    # at least one brick (z displacements of ±18 within a few voxels)
    g = [np.arange(s, dtype=np.float32) for s in shape]
    px, py, pz = np.meshgrid(*g, indexing="ij")
    pos = jnp.asarray(
        np.stack([px, py, pz], -1).reshape(-1, 3).astype(np.float32)
    )
    nbr = W.neighbor_lookup(wf, pos, 2)
    warped = np.asarray(W.warp_points(wf, pos, nbr, m_lw=lw)).reshape(
        *shape, 3
    )
    wzb = warped[..., 2].reshape(2, 8, 3, 8, 16, 8)
    spread = wzb.max(axis=(1, 3, 5)) - wzb.min(axis=(1, 3, 5))
    assert float(spread.max()) > 20.0, float(spread.max())

    kw = dict(k=2, tdist=0.5, wmax=100.0, brick=8, n_candidates=4)
    want_v, want_w, _, _ = W.update_tsdf_nonrigid(
        values, weights, live, wf, lw, use_pallas=False, **kw
    )
    got_v, got_w, esc_dropped, _ = W.update_tsdf_nonrigid(
        values, weights, live, wf, lw, use_pallas=True,
        pallas_interpret=True, pallas_precise=True, **kw
    )
    assert int(esc_dropped) == 0  # all escapees fit the fixup capacity
    np.testing.assert_allclose(
        np.asarray(got_v), np.asarray(want_v), atol=3e-3
    )
    np.testing.assert_allclose(
        np.asarray(got_w), np.asarray(want_w), atol=3e-3
    )

    # the CACHED Pallas kernel (kNN stage precomputed) must agree too —
    # same tearing warp so the escape fixup path is exercised with the
    # cache as well
    cand, risk = W.brick_candidates_2level(
        wf, shape, 8, 4, with_risk=True, risk_k=2
    )
    wc = W.build_warp_cache(wf, shape, cand, 2, 8)
    got_cv, got_cw, esc_c, _ = W.update_tsdf_nonrigid(
        values, weights, live, wf, lw, use_pallas=True,
        pallas_interpret=True, pallas_precise=True,
        cand_cache=(cand, risk), warp_cache=wc, **kw
    )
    assert int(esc_c) == 0
    np.testing.assert_allclose(
        np.asarray(got_cv), np.asarray(want_v), atol=3e-3
    )
    np.testing.assert_allclose(
        np.asarray(got_cw), np.asarray(want_w), atol=3e-3
    )


def test_mip_skip_uniform_regions_exact(rng):
    """The live-space uniformity certificate (_mip_class): a truncated
    live TSDF (saturated +tdist far field, <= -tdist interior, narrow
    band at the surface) must fuse IDENTICALLY through the mip-skipping
    cached kernel and the exact XLA path — far-field voxels update with
    the exact constant +tdist, interior samples are skipped, band
    samples take the full interpolation path."""
    shape = (32, 32, 128)  # kernel-supported: (ry-24)%8==0, rz%128==0
    tdist = 3.0
    gx = np.arange(shape[0], dtype=np.float32)
    gy = np.arange(shape[1], dtype=np.float32)
    gz = np.arange(shape[2], dtype=np.float32)
    x, y, z = np.meshgrid(gx, gy, gz, indexing="ij")
    r = np.sqrt((x - 16) ** 2 + (y - 15) ** 2 + (z - 64) ** 2)
    live = np.clip(r - 9.0, -tdist, tdist).astype(np.float32)

    verts = (rng.rand(40, 3) * 14 + 9).astype(np.float32)
    verts[:, 2] += 48.0
    wf = W.construct_graph(jnp.asarray(verts), jnp.float32(2.0), 64)
    dqs = (rng.randn(64, 8) * 0.03).astype(np.float32)
    dqs[:, 0] += 1.0
    wf = wf.replace(node_dq=jnp.asarray(dqs))
    lw = jnp.array([1.0, 0, 0, 0, 0, 0.3, -0.2, 0.1], jnp.float32)

    values = jnp.asarray(
        np.clip(r - 8.0, -tdist, tdist).astype(np.float32))
    weights = jnp.asarray((rng.rand(*shape) * 4).astype(np.float32))
    live_j = jnp.asarray(live)

    kw = dict(k=3, tdist=tdist, wmax=100.0, brick=8, n_candidates=8)
    want_v, want_w, _, _ = W.update_tsdf_nonrigid(
        values, weights, live_j, wf, lw, use_pallas=False, **kw
    )
    cand, risk = W.brick_candidates_2level(
        wf, shape, 8, 8, with_risk=True, risk_k=3)
    wc = W.build_warp_cache(wf, shape, cand, 3, 8)
    got_v, got_w, esc, _ = W.update_tsdf_nonrigid(
        values, weights, live_j, wf, lw, use_pallas=True,
        pallas_interpret=True, pallas_precise=True,
        cand_cache=(cand, risk), warp_cache=wc, **kw
    )
    assert int(esc) == 0
    np.testing.assert_allclose(
        np.asarray(got_v), np.asarray(want_v), atol=3e-3)
    np.testing.assert_allclose(
        np.asarray(got_w), np.asarray(want_w), atol=3e-3)
    # the far field must have genuinely updated (weights grew) and carry
    # the EXACT saturation constant
    margin = (  # keep away from walls: lw pushes edge voxels OOB (no update)
        (x > 3) & (x < shape[0] - 4) & (y > 3) & (y < shape[1] - 4)
        & (z > 3) & (z < shape[2] - 4)
    )
    far = np.asarray((r > 24.0) & margin)
    assert far.sum() > 1000
    assert np.all(np.asarray(got_w)[far] > np.asarray(weights)[far])
    fv = np.asarray(got_v)[far]
    np.testing.assert_allclose(fv, tdist, atol=1e-4)
    # the certificate must have engaged: a majority of far-field voxels
    # carry the EXACT constant (the rest sit in bricks whose warped
    # footprint could not be certified and take the full path)
    assert float((fv == tdist).mean()) > 0.5, float((fv == tdist).mean())
