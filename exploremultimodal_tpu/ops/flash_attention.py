"""Fused (flash-style) attention TPU kernel in Pallas.

Replaces the reference's unfused softmax-attention matmul chain
(models/vlmo/vlmo.py:88-95) — the hottest op in every VLMo stream. The kernel
tiles over (batch·heads, query blocks); each program holds one query tile and
the full key/value rows in VMEM, computes scores in fp32 on the MXU and the
softmax-weighted sum without ever writing the (B, H, N, N) score tensor to
HBM. VLMo sequences are short (txt 40 / img 197 / fused 237 / nlp 512), so
full K/V rows per program fit comfortably in VMEM (512×64×4B×2 = 256 KiB);
longer sequences would take a k-blocked online-softmax variant.

Numerics: max-subtracted softmax in fp32, matching jax.nn.softmax, so the
XLA path and this kernel agree to fp32 tolerance (tests/test_ops.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from exploremultimodal_tpu.ops.attention import NEG_INF

BLOCK_Q = 128
BLOCK_K = 512
# sequences at or below this keep the simpler full-row kernel (K/V rows fit
# VMEM comfortably); longer ones stream K/V blocks with online softmax
LONG_SEQ_THRESHOLD = 1024


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _attn_long_kernel(
    q_ref, k_ref, v_ref, bias_ref, o_ref, m_scr, l_scr, acc_scr, *, scale: float
):
    """Online-softmax flash attention for long sequences: the grid's last
    dimension walks K/V blocks sequentially, carrying the running max (m),
    normalizer (l), and weighted accumulator in VMEM scratch that persists
    across grid steps (TPU grids execute sequentially per core)."""
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0].astype(jnp.float32)  # (BQ, D)
    k = k_ref[0].astype(jnp.float32)  # (BK, D)
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale + bias_ref[0]  # (BQ, BK)

    m_prev = m_scr[:]
    m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
    correction = jnp.exp(m_prev - m_new)
    p = jnp.exp(scores - m_new)  # (BQ, BK)
    v = v_ref[0].astype(jnp.float32)
    acc_scr[:] = acc_scr[:] * correction + jnp.dot(
        p, v, preferred_element_type=jnp.float32
    )
    l_scr[:] = l_scr[:] * correction + jnp.sum(p, axis=-1, keepdims=True)
    m_scr[:] = m_new

    @pl.when(ik == nk - 1)
    def _finalize():
        o_ref[0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)  # (BQ, D)
    k = k_ref[0].astype(jnp.float32)  # (N, D)
    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (BQ, N)
    scores = scores + bias_ref[0]  # (1, N) key-padding bias broadcasts over rows
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    v = v_ref[0].astype(jnp.float32)  # (N, D)
    out = jnp.dot(p, v, preferred_element_type=jnp.float32) / denom
    o_ref[0] = out.astype(o_ref.dtype)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    bias: jax.Array | None = None,
    scale: float,
) -> jax.Array:
    """Differentiable fused attention: Pallas forward kernel + recompute
    backward (the standard flash-attention trade: no stored probabilities;
    the backward re-derives them — here via the XLA chain, which XLA fuses)."""
    if bias is None:
        bias = jnp.zeros((q.shape[0], 1, 1, q.shape[2]), jnp.float32)
    return _flash_attention_vjp(q, k, v, bias, scale)


def _xla_reference(q, k, v, bias, scale):
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    scores = scores + bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash_attention_vjp(q, k, v, bias, scale):
    return _flash_attention_fwd_kernel(q, k, v, bias, scale)


def _flash_fwd(q, k, v, bias, scale):
    out = _flash_attention_fwd_kernel(q, k, v, bias, scale)
    return out, (q, k, v, bias)


def _flash_bwd(scale, residuals, g):
    q, k, v, bias = residuals
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_reference(q_, k_, v_, bias, scale),
                     q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_flash_attention_vjp.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.jit, static_argnames=("scale",))
def _flash_attention_fwd_kernel(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,
    scale: float,
) -> jax.Array:
    """q, k, v: (B, H, N, D); bias: (B, 1, 1, N) additive."""
    B, H, N, D = q.shape
    n_pad = _round_up(N, BLOCK_Q)

    if bias is None:
        key_bias = jnp.zeros((B, 1, N), dtype=jnp.float32)
    else:
        key_bias = bias.astype(jnp.float32).reshape(B, 1, N)
    if n_pad != N:
        pad = [(0, 0), (0, 0), (0, n_pad - N)]
        key_bias = jnp.pad(key_bias, pad, constant_values=NEG_INF)
        qkv_pad = [(0, 0), (0, 0), (0, n_pad - N), (0, 0)]
        q = jnp.pad(q, qkv_pad)
        k = jnp.pad(k, qkv_pad)
        v = jnp.pad(v, qkv_pad)

    qf = q.reshape(B * H, n_pad, D)
    kf = k.reshape(B * H, n_pad, D)
    vf = v.reshape(B * H, n_pad, D)

    n_q_blocks = n_pad // BLOCK_Q

    if n_pad > LONG_SEQ_THRESHOLD:
        n_k_blocks = n_pad // BLOCK_K if n_pad % BLOCK_K == 0 else None
        bk = BLOCK_K if n_k_blocks else BLOCK_Q
        n_k_blocks = n_k_blocks or (n_pad // BLOCK_Q)
        out = pl.pallas_call(
            functools.partial(_attn_long_kernel, scale=scale),
            out_shape=jax.ShapeDtypeStruct(qf.shape, q.dtype),
            grid=(B * H, n_q_blocks, n_k_blocks),
            in_specs=[
                pl.BlockSpec((1, BLOCK_Q, D), lambda bh, i, j: (bh, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bk, D), lambda bh, i, j: (bh, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bk, D), lambda bh, i, j: (bh, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bk), lambda bh, i, j, H=H: (bh // H, 0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, BLOCK_Q, D), lambda bh, i, j: (bh, i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((BLOCK_Q, 1), jnp.float32),
                pltpu.VMEM((BLOCK_Q, 1), jnp.float32),
                pltpu.VMEM((BLOCK_Q, D), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=4 * B * H * n_pad * n_pad * D,
                bytes_accessed=4 * B * H * n_pad * D * q.dtype.itemsize,
                transcendentals=B * H * n_pad * n_pad,
            ),
            interpret=jax.default_backend() == "cpu",
        )(qf, kf, vf, key_bias)
        out = out.reshape(B, H, n_pad, D)
        return out[:, :, :N, :] if n_pad != N else out

    grid = (B * H, n_q_blocks)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct(qf.shape, q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q, D), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, D), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, D), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_pad), lambda bh, i, H=H: (bh // H, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_Q, D), lambda bh, i: (bh, i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * n_pad * n_pad * D,
            bytes_accessed=3 * B * H * n_pad * D * q.dtype.itemsize
            + B * H * n_pad * D * q.dtype.itemsize,
            transcendentals=B * H * n_pad * n_pad,
        ),
        # CPU (tests) has no Mosaic backend; run interpreted there
        interpret=jax.default_backend() == "cpu",
    )(qf, kf, vf, key_bias)

    out = out.reshape(B, H, n_pad, D)
    return out[:, :, :N, :] if n_pad != N else out
