"""Stochastic-depth (DropPath) — per-sample residual-branch dropout.

Reference parity: timm DropPath used at models/vlmo/vlmo.py:132-133,187-197.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def drop_path(
    x: jax.Array,
    rate: float,
    rng: jax.Array | None,
    deterministic: bool,
) -> jax.Array:
    """Zero the whole residual branch per sample with probability `rate`."""
    if deterministic or rate == 0.0:
        return x
    if rng is None:
        raise ValueError("drop_path needs an rng when not deterministic")
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, p=keep, shape=shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))
