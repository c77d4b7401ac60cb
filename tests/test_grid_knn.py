"""Grid-hash kNN vs brute force within its locality contract."""

import numpy as np
import jax.numpy as jnp

from dynamicfusion_body_tpu.ops.grid_knn import grid_knn


def test_grid_knn_matches_bruteforce(rng):
    P = 3000
    pts = (rng.rand(P, 3) * 200 + 10).astype(np.float32)
    q = (pts[:200] + rng.randn(200, 3) * 2).astype(np.float32)
    d, i, found, _ovf = grid_knn(jnp.array(q), jnp.array(pts), 3, cell=16.0,
                           cap_per_cell=256, grid_n=16)
    d = np.asarray(d)
    i = np.asarray(i)
    found = np.asarray(found)
    for j in range(len(q)):
        dd = np.linalg.norm(pts - q[j], axis=1)
        o = np.argsort(dd)[:3]
        # contract: exact for neighbors within cell/2
        for kk in range(3):
            if dd[o[kk]] <= 8.0 - 1e-3:
                assert found[j, kk]
                np.testing.assert_allclose(d[j, kk], dd[o[kk]], atol=1e-4)
                assert i[j, kk] == o[kk] or np.isclose(dd[i[j, kk]], dd[o[kk]])


def test_grid_knn_respects_valid_mask(rng):
    pts = (rng.rand(100, 3) * 50 + 5).astype(np.float32)
    valid = np.ones(100, bool)
    valid[:50] = False
    q = pts[:10] + 0.01
    d, i, found, _ovf = grid_knn(jnp.array(q), jnp.array(pts), 1,
                           valid=jnp.array(valid), cell=16.0,
                           cap_per_cell=128, grid_n=8)
    i = np.asarray(i)
    assert np.all(i[np.asarray(found[:, 0])] >= 50)


def test_grid_knn_no_neighbors(rng):
    pts = np.full((10, 3), 5.0, np.float32)
    q = np.full((4, 3), 200.0, np.float32)
    d, i, found, _ovf = grid_knn(jnp.array(q), jnp.array(pts), 2, cell=16.0,
                           cap_per_cell=64, grid_n=16)
    assert not np.asarray(found).any()


def test_grid_knn_flags_cell_overflow(rng):
    # 40 points crammed into one cell with cap_per_cell=16 → overflow True
    pts = (rng.rand(40, 3) * 4 + 20).astype(np.float32)
    q = pts[:5]
    *_, ovf = grid_knn(jnp.array(q), jnp.array(pts), 2, cell=16.0,
                       cap_per_cell=16, grid_n=8)
    assert bool(ovf)
    *_, ok = grid_knn(jnp.array(q), jnp.array(pts), 2, cell=16.0,
                      cap_per_cell=64, grid_n=8)
    assert not bool(ok)
