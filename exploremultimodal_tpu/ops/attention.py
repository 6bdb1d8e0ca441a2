"""Multi-head attention compute paths.

Semantics match the reference attention exactly (models/vlmo/vlmo.py:68-98):
scores = q @ kᵀ · scale, additive −inf at masked KEY positions (key-padding
mask broadcast over heads and query positions), softmax, optional attention
dropout, weighted sum of v. Softmax runs in fp32 regardless of compute dtype.

Two implementations behind one signature:
  'xla'     — plain einsum chain; XLA fuses it well at these sizes
  'pallas'  — blockwise flash-attention TPU kernel (ops/flash_attention.py):
              never materializes the (B, H, N, N) score matrix in HBM

The Pallas path is used when impl='pallas', the sequence is worth tiling, and
no attention dropout is requested (pretraining uses attn_drop=0.1, so the
training fwd keeps XLA unless attn_drop is disabled; eval/inference always
may use pallas).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def key_padding_bias(mask: jax.Array | None, dtype=jnp.float32) -> jax.Array | None:
    """(B, N) {0,1} key mask → (B, 1, 1, N) additive bias (0 keep / −inf drop)."""
    if mask is None:
        return None
    return ((1.0 - mask.astype(dtype)) * NEG_INF)[:, None, None, :]


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    bias: jax.Array | None = None,
    scale: float | None = None,
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
    deterministic: bool = True,
    impl: str = "xla",
) -> jax.Array:
    """q, k, v: (B, H, N, D_head) → (B, H, N, D_head)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5

    use_pallas = (
        impl == "pallas"
        and (deterministic or dropout_rate == 0.0)
        and q.shape[-2] == k.shape[-2]
    )
    if use_pallas:
        from exploremultimodal_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, bias=bias, scale=scale)

    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    probs = probs.astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)
