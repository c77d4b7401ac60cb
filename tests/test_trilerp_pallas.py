"""Pallas brick-trilerp kernel vs the reference trilerp semantics
(interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from dynamicfusion_body_tpu.ops.trilerp_pallas import trilerp_bricks
import oracles


def test_trilerp_bricks_matches_oracle(rng):
    R = 32
    live = rng.randn(R, R, R).astype(np.float32)
    NB, V = 16, 512
    # brick-coherent samples: per brick a random 8³ origin + jitter ≤ 2
    wx = np.zeros((NB, V), np.float32)
    wy = np.zeros((NB, V), np.float32)
    wz = np.zeros((NB, V), np.float32)
    for b in range(NB):
        o = rng.rand(3) * (R - 12) + 1
        g = np.stack(np.meshgrid(*([np.arange(8)] * 3), indexing="ij"), -1)
        pos = o + g.reshape(-1, 3) + rng.randn(V, 3) * 0.7
        wx[b], wy[b], wz[b] = pos[:, 0], pos[:, 1], pos[:, 2]
    # some out-of-volume samples
    wx[0, :5] = -2.0
    wy[1, 7] = R + 3.0

    vals, valid = trilerp_bricks(
        jnp.asarray(live), jnp.asarray(wx), jnp.asarray(wy), jnp.asarray(wz),
        group=4, interpret=True,
    )
    vals = np.asarray(vals)
    valid = np.asarray(valid)
    for b in range(0, NB, 3):
        for v in range(0, V, 37):
            want = oracles.trilerp_oracle(
                np.array([wx[b, v], wy[b, v], wz[b, v]], np.float64), live
            )
            if want is None:
                assert not valid[b, v]
            else:
                assert valid[b, v]
                np.testing.assert_allclose(vals[b, v], want, atol=2e-4)


def test_trilerp_bricks_boundary(rng):
    R = 24
    live = rng.randn(R, R, R).astype(np.float32)
    V = 512
    # brick 0 hugs the far corner (exact boundary), brick 1 the origin —
    # samples within a brick must be local (one box per brick)
    wx = np.full((2, V), R - 1.0, np.float32)
    wy = np.full((2, V), R - 1.0, np.float32)
    wz = np.full((2, V), R - 1.0, np.float32)
    wx[1], wy[1], wz[1] = 0.0, 0.0, 0.0
    wx[0, 1], wy[0, 1], wz[0, 1] = R - 1.5, R - 2.25, R - 9.0
    vals, valid = trilerp_bricks(
        jnp.asarray(live), jnp.asarray(wx), jnp.asarray(wy), jnp.asarray(wz),
        group=1, interpret=True,
    )
    assert bool(valid[0, 0]) and bool(valid[1, 0]) and bool(valid[0, 1])
    np.testing.assert_allclose(
        float(vals[0, 0]), live[R - 1, R - 1, R - 1], atol=1e-5
    )
    np.testing.assert_allclose(float(vals[1, 0]), live[0, 0, 0], atol=1e-5)
    want = oracles.trilerp_oracle(
        np.array([R - 1.5, R - 2.25, R - 9.0]), live
    )
    np.testing.assert_allclose(float(vals[0, 1]), want, atol=2e-4)
