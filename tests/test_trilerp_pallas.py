"""Pallas brick-trilerp kernel vs the reference trilerp semantics
(interpret mode on CPU). The oracle tests use precise=True (hi/lo
three-pass weights) — the mode whose error (~2⁻¹⁶·|live|) is below the
oracle tolerance even on white-noise volumes; the default fast mode is
validated separately on a Lipschitz (TSDF-like) volume at its own
contract of ~2⁻⁸·|live|."""

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

    vals, valid, _esc = trilerp_bricks(
        jnp.asarray(live), jnp.asarray(wx), jnp.asarray(wy), jnp.asarray(wz),
        group=1, interpret=True, precise=True,
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
    vals, valid, _esc = trilerp_bricks(
        jnp.asarray(live), jnp.asarray(wx), jnp.asarray(wy), jnp.asarray(wz),
        group=1, interpret=True, precise=True,
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


def test_trilerp_bricks_fast_mode_smooth_volume(rng):
    """Default (single-pass bf16) mode contract: error ≲ 2⁻⁸·|live| on a
    Lipschitz volume — the shape of a real TSDF, whose values are bounded
    by the truncation distance."""
    R = 32
    g = np.arange(R, dtype=np.float32)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    live = (np.sqrt((x - 15.0) ** 2 + (y - 14.0) ** 2 + (z - 17.0) ** 2)
            - 9.0)
    live = np.clip(live, -3.0, 3.0).astype(np.float32) * 0.1
    NB, V = 8, 512
    base = rng.rand(NB, 1, 3).astype(np.float32) * (R - 12) + 1
    offs = rng.rand(NB, V, 3).astype(np.float32) * 8.0
    w = base + offs
    vals, valid, _ = trilerp_bricks(
        jnp.asarray(live), jnp.asarray(w[..., 0]), jnp.asarray(w[..., 1]),
        jnp.asarray(w[..., 2]), group=1, interpret=True,
    )
    vals = np.asarray(vals)
    valid = np.asarray(valid)
    assert valid.mean() > 0.9
    for b in range(NB):
        for v in range(0, V, 29):
            want = oracles.trilerp_oracle(w[b, v].astype(np.float64), live)
            if want is not None and valid[b, v]:
                # three bf16 roundings (box, taps, weight product) →
                # ≲3·2⁻⁸·max|live| with max|live| = 0.3
                np.testing.assert_allclose(
                    vals[b, v], want, atol=3 * 2 ** -8 * 0.3 + 1e-4
                )
