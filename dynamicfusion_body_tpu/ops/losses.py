"""Robust losses and IRLS weights (batched JAX).

Reference: core/util.py:50-60 defines huber/tukey helpers (kept for parity);
the reference's solver instead relies on scipy's ``loss='huber'`` with
f_scale=1 (core/fusion.py:389). Our Gauss-Newton solver applies the same
robustification via IRLS weights, which is the standard GN-compatible form.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def huber_loss(x: jax.Array, c: jax.Array) -> jax.Array:
    """0.5 x² inside |x|<=c, else c(|x| - c/2). Reference core/util.py:50-54."""
    a = jnp.abs(x)
    return jnp.where(a <= c, 0.5 * x * x, c * (a - 0.5 * c))


def tukey_biweight_loss(x: jax.Array, c: jax.Array) -> jax.Array:
    """x(1-(x/c)²)² inside |x|<=c, else 0 — reference's (quirky) form,
    core/util.py:56-60. Reproduced as-specified, not the textbook rho."""
    return jnp.where(jnp.abs(x) > c, 0.0, x * (1.0 - (x / c) ** 2) ** 2)


def huber_irls_weight(r: jax.Array, f_scale: float = 1.0) -> jax.Array:
    """IRLS weight for scipy-style huber: rho(z)=z for z<=1 else 2√z-1,
    z=(r/f_scale)². Weight = rho'(z) = 1 inside, 1/√z = f_scale/|r| outside.

    Multiplying J and r rows by √w reproduces scipy's robustified normal
    equations (scipy least_squares loss='huber', f_scale=1 default as used
    at core/fusion.py:382-392).
    """
    a = jnp.abs(r) / f_scale
    return jnp.where(a <= 1.0, 1.0, 1.0 / jnp.maximum(a, 1e-30))


def tukey_irls_weight(r: jax.Array, c: jax.Array) -> jax.Array:
    """Standard Tukey biweight IRLS weight (1-(r/c)²)² inside, 0 outside."""
    z = (r / c) ** 2
    return jnp.where(z <= 1.0, (1.0 - z) ** 2, 0.0)
