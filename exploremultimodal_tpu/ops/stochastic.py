"""Stochastic ops: DropPath and integer-threshold hidden dropout.

Reference parity: timm DropPath used at models/vlmo/vlmo.py:132-133,187-197;
nn.Dropout (drop_rate/proj_drop) used throughout models/vlmo/vlmo.py.
"""

from __future__ import annotations

import flax.linen as nn
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


class FastDropout(nn.Module):
    """nn.Dropout semantics with the keep-mask from raw uint16 PRNG bits.

    jax.random.bernoulli materializes an f32 uniform (4 bytes/element: the
    u32→mantissa shift/or/sub pipeline) and then compares; at MLP widths
    (B, N, 4·dim) that generate+convert+compare chain was ~13 ms of the
    209 ms headline step (BENCH.md round 3 profile: `_bernoulli/lt` loop
    fusions + `_uniform` rng). Comparing the raw 16-bit draw against an
    integer threshold skips the float pipeline and halves mask-gen HBM
    traffic; the realized drop probability is quantized to 1/65536
    (|Δrate| ≤ 2⁻¹⁷, e.g. 0.1 → 0.1000061).
    """

    rate: float
    deterministic: bool | None = None
    rng_collection: str = "dropout"

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool | None = None) -> jax.Array:
        deterministic = nn.merge_param(
            "deterministic", self.deterministic, deterministic
        )
        if self.rate == 0.0 or deterministic:
            return x
        if self.rate == 1.0:
            return jnp.zeros_like(x)
        threshold = int(round(self.rate * 65536.0))
        if threshold == 0:
            return x
        keep_prob = (65536 - threshold) / 65536.0
        bits = jax.random.bits(
            self.make_rng(self.rng_collection), x.shape, jnp.uint16
        )
        keep = bits >= jnp.uint16(threshold)
        scale = jnp.asarray(1.0 / keep_prob, x.dtype)
        return jnp.where(keep, x * scale, jnp.zeros_like(x))
