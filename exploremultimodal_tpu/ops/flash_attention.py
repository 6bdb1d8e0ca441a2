"""Fused (flash-style) attention TPU kernels in Pallas — forward AND backward.

Replaces the reference's unfused softmax-attention matmul chain
(models/vlmo/vlmo.py:88-95) — the hottest op in every VLMo stream.

Forward: tiles over (batch·heads, query blocks); each program holds one query
tile and the full key/value rows in VMEM, computes scores in fp32 on the MXU
and the softmax-weighted sum without ever writing the (B, H, N, N) score
tensor to HBM. It also emits the per-row logsumexp so the backward can
reconstitute probabilities exactly.

Backward: one program per (batch·head) recomputes the score tile in VMEM from
(q, k, bias, lse) and produces dq/dk/dv with five MXU matmuls — the standard
flash-attention backward (dv = pᵀ·do, ds = p·(do·vᵀ − rowsum(do·o)),
dq = ds·k, dk = dsᵀ·q). No (B, H, N, N) tensor ever reaches HBM in either
direction, which is what buys large-batch training headroom (BENCH.md: the
XLA backward's transient N² buffers were the batch-64 OOM).

VLMo sequences are short (txt 40 / img 197 / fused 237 / nlp 512), so full
K/V rows per program fit comfortably in VMEM (512×64×4B×2 = 256 KiB); longer
sequences take the k-blocked online-softmax forward with an XLA-recompute
backward.

Numerics: max-subtracted softmax in fp32, matching jax.nn.softmax, so the
XLA path and this kernel agree to fp32 tolerance (tests/test_ops.py), and
gradients agree with differentiating the XLA chain.
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
# sequences at or below this use the fused Pallas BACKWARD too. The bwd
# kernel keeps ~4 (N, N) fp32 tiles live (s/p, dp, ds, plus accumulators) —
# ~4 MiB at N=512 but ~16 MiB at 1024, over the v5e VMEM budget — so the
# ceiling is 512 (covers every VLMo stream: txt 40 / img 197 / fused 237 /
# nlp 512)
LONG_SEQ_THRESHOLD = 512
# ... above that the backward is XLA-recompute, and the full-row FORWARD
# kernel is kept while a (BLOCK_Q, N) score tile + K/V rows fit VMEM
# (128·4096·4 = 2 MiB scores); only beyond this does the k-blocked
# online-softmax kernel pay for its per-program overhead
FULL_ROW_FWD_MAX = 4096


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ------------------------------------------------------- in-kernel dropout

# Attention-prob dropout INSIDE the kernels: bits come from a counter-based
# murmur3-style hash of (seed, batch·head, global row, col), so the backward
# regenerates the exact forward mask from the same scalars and the mask never
# exists in HBM in either direction. A hand-rolled hash (not
# pltpu.prng_random_bits) because it is bit-identical in Mosaic and in
# interpret mode (CPU tests) — pltpu's hardware PRNG has no interpret-mode
# lowering in this JAX — and dropout only needs avalanche-quality bits.


def _dropout_bits(key0, key1, row0, shape):
    """uint32 bits for a (rows, cols) tile whose global top row is `row0`.
    Element counter = global_row * 2^16 + col (unique per bh-tile for
    N ≤ LONG_SEQ_THRESHOLD), avalanched with two key-injected murmur rounds."""
    r = jax.lax.broadcasted_iota(jnp.uint32, shape, 0) + jnp.uint32(row0)
    c = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = r * jnp.uint32(65536) + c
    x = x ^ key0
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x ^ key1
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x27D4EB2F)
    x = x ^ (x >> 15)
    return x


def _dropout_keys(seed_ref, bh):
    """Two per-(seed, batch·head) uint32 keys from the SMEM seed scalar."""
    s = seed_ref[0].astype(jnp.uint32)
    bhu = jnp.uint32(bh)
    key0 = (s ^ (bhu * jnp.uint32(0x9E3779B9))) | jnp.uint32(1)
    key1 = (s * jnp.uint32(0x85EBCA6B)) ^ (bhu + jnp.uint32(0x165667B1))
    return key0, key1


def _keep_mask(seed_ref, bh, row0, shape, rate: float):
    """fp32 {0, 1/(1-rate)} inverted-dropout scale tile."""
    key0, key1 = _dropout_keys(seed_ref, bh)
    bits = _dropout_bits(key0, key1, row0, shape)
    threshold = jnp.uint32(min(int(rate * 2**32), 2**32 - 1))
    return jnp.where(bits >= threshold, 1.0 / (1.0 - rate), 0.0)


def _interpret() -> bool:
    # CPU (tests) has no Mosaic backend; run interpreted there
    return jax.default_backend() == "cpu"


# --------------------------------------------------------------- fwd kernels


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


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *, scale: float):
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
    lse_ref[0] = m + jnp.log(denom)  # (BQ, 1)


def _attn_bwd_kernel(
    q_ref, k_ref, v_ref, bias_ref, o_ref, do_ref, lse_ref,
    dq_ref, dk_ref, dv_ref, *, scale: float
):
    """Full-row flash backward for one (batch, head): five MXU matmuls,
    score/probability tiles live only in VMEM."""
    q = q_ref[0].astype(jnp.float32)   # (N, D)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    o = o_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]                    # (N, 1)

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale + bias_ref[0]             # (N, N); bias (1, N) broadcasts
    p = jnp.exp(s - lse)                # exact probabilities, no re-softmax

    delta = jnp.sum(do * o, axis=-1, keepdims=True)  # (N, 1)
    dv = jax.lax.dot_general(            # pᵀ · do
        p, do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(            # do · vᵀ
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta)
    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(            # dsᵀ · q
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _attn_drop_kernel(
    seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref,
    *, scale: float, rate: float,
):
    """Full-row forward with in-kernel attention-prob dropout. Dropout applies
    to the NORMALIZED probabilities (p/denom, matching nn.Dropout on softmax
    output), folded in as out = (mask∘p)·v / denom. lse is the no-dropout
    logsumexp, so the backward reconstructs clean p and re-applies the mask."""
    bh = pl.program_id(0)
    iq = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)  # (BQ, D)
    k = k_ref[0].astype(jnp.float32)  # (N, D)
    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    scores = scores + bias_ref[0]
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    keep = _keep_mask(seed_ref, bh, iq * q_ref.shape[1], p.shape, rate)
    v = v_ref[0].astype(jnp.float32)
    out = jnp.dot(p * keep, v, preferred_element_type=jnp.float32) / denom
    o_ref[0] = out.astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(denom)


def _attn_drop_bwd_kernel(
    seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, do_ref, lse_ref,
    dq_ref, dk_ref, dv_ref, *, scale: float, rate: float,
):
    """Flash backward with the forward's dropout mask regenerated in VMEM.
    With pd = mask∘p/denom and out = pd·v, the softmax-VJP row term
    Σ_j dP_ij·P_ij still equals rowsum(do∘o): Σ_j (do·vᵀ)_ij·pd_ij =
    Σ_d do_id Σ_j pd_ij v_jd — so delta needs no extra pass."""
    bh = pl.program_id(0)
    q = q_ref[0].astype(jnp.float32)   # (N, D)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    o = o_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]                    # (N, 1)

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale + bias_ref[0]             # (N, N)
    p = jnp.exp(s - lse)                # normalized, pre-dropout
    keep = _keep_mask(seed_ref, bh, 0, p.shape, rate)

    delta = jnp.sum(do * o, axis=-1, keepdims=True)  # (N, 1)
    dv = jax.lax.dot_general(            # (mask∘p)ᵀ · do
        p * keep, do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(            # do · vᵀ, masked
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * keep
    ds = p * (dp - delta)
    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(            # dsᵀ · q
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


# ------------------------------------------------------------- pallas calls


def _fwd_call(qf, kf, vf, key_bias, scale):
    """qf/kf/vf: (BH, N, D) with N a multiple of BLOCK_Q; key_bias (B, 1, N).
    Returns (out (BH, N, D), lse (BH, N, 1) fp32 — trailing singleton keeps
    the block shape (1, BLOCK_Q, 1) legal for Mosaic's (8, 128) tiling rule)."""
    BH, N, D = qf.shape
    B = key_bias.shape[0]
    H = BH // B
    n_q_blocks = N // BLOCK_Q
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct(qf.shape, qf.dtype),
            jax.ShapeDtypeStruct((BH, N, 1), jnp.float32),
        ),
        grid=(BH, n_q_blocks),
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q, D), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda bh, i, H=H: (bh // H, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, BLOCK_Q, D), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_Q, 1), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * N * N * D,
            bytes_accessed=4 * BH * N * D * qf.dtype.itemsize,
            transcendentals=BH * N * N,
        ),
        interpret=_interpret(),
    )(qf, kf, vf, key_bias)


def _fwd_drop_call(seed, qf, kf, vf, key_bias, scale, rate):
    """Dropout forward: same tiling as _fwd_call plus an SMEM seed scalar."""
    BH, N, D = qf.shape
    B = key_bias.shape[0]
    H = BH // B
    n_q_blocks = N // BLOCK_Q
    return pl.pallas_call(
        functools.partial(_attn_drop_kernel, scale=scale, rate=rate),
        out_shape=(
            jax.ShapeDtypeStruct(qf.shape, qf.dtype),
            jax.ShapeDtypeStruct((BH, N, 1), jnp.float32),
        ),
        grid=(BH, n_q_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, BLOCK_Q, D), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda bh, i, H=H: (bh // H, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, BLOCK_Q, D), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_Q, 1), lambda bh, i: (bh, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * N * N * D,
            bytes_accessed=4 * BH * N * D * qf.dtype.itemsize,
            transcendentals=BH * N * N,
        ),
        interpret=_interpret(),
    )(seed, qf, kf, vf, key_bias)


def _bwd_drop_call(seed, qf, kf, vf, key_bias, of, dof, lse, scale, rate):
    BH, N, D = qf.shape
    B = key_bias.shape[0]
    H = BH // B
    row = lambda bh: (bh, 0, 0)  # noqa: E731
    full = pl.BlockSpec((1, N, D), row, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_drop_bwd_kernel, scale=scale, rate=rate),
        out_shape=(
            jax.ShapeDtypeStruct(qf.shape, qf.dtype),
            jax.ShapeDtypeStruct(kf.shape, kf.dtype),
            jax.ShapeDtypeStruct(vf.shape, vf.dtype),
        ),
        grid=(BH,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            full, full, full,
            pl.BlockSpec((1, 1, N), lambda bh, H=H: (bh // H, 0, 0),
                         memory_space=pltpu.VMEM),
            full, full,
            pl.BlockSpec((1, N, 1), lambda bh: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(full, full, full),
        cost_estimate=pl.CostEstimate(
            flops=10 * BH * N * N * D,
            bytes_accessed=9 * BH * N * D * qf.dtype.itemsize,
            transcendentals=BH * N * N,
        ),
        interpret=_interpret(),
    )(seed, qf, kf, vf, key_bias, of, dof, lse)


def _bwd_call(qf, kf, vf, key_bias, of, dof, lse, scale):
    """Flash backward on the flat padded layout; returns (dq, dk, dv)."""
    BH, N, D = qf.shape
    B = key_bias.shape[0]
    H = BH // B
    row = lambda bh: (bh, 0, 0)  # noqa: E731
    full = pl.BlockSpec((1, N, D), row, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct(qf.shape, qf.dtype),
            jax.ShapeDtypeStruct(kf.shape, kf.dtype),
            jax.ShapeDtypeStruct(vf.shape, vf.dtype),
        ),
        grid=(BH,),
        in_specs=[
            full, full, full,
            pl.BlockSpec((1, 1, N), lambda bh, H=H: (bh // H, 0, 0),
                         memory_space=pltpu.VMEM),
            full, full,
            pl.BlockSpec((1, N, 1), lambda bh: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(full, full, full),
        cost_estimate=pl.CostEstimate(
            flops=10 * BH * N * N * D,
            bytes_accessed=9 * BH * N * D * qf.dtype.itemsize,
            transcendentals=BH * N * N,
        ),
        interpret=_interpret(),
    )(qf, kf, vf, key_bias, of, dof, lse)


# --------------------------------------------------------------- custom VJP


def _xla_reference_flat(qf, kf, vf, key_bias, scale):
    """XLA chain on the flat (BH, N, D) layout — the single reference
    implementation, used as the recompute backward beyond the fused-bwd
    sequence limit."""
    B = key_bias.shape[0]
    H = qf.shape[0] // B
    scores = jnp.einsum(
        "bnd,bkd->bnk", qf, kf, preferred_element_type=jnp.float32
    ) * scale
    scores = scores + jnp.repeat(key_bias.astype(scores.dtype), H, axis=0)
    probs = jax.nn.softmax(scores, axis=-1).astype(vf.dtype)
    return jnp.einsum("bnk,bkd->bnd", probs, vf)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash_core(qf, kf, vf, key_bias, scale):
    out, _ = _fwd_call(qf, kf, vf, key_bias, scale)
    return out


def _flash_core_fwd(qf, kf, vf, key_bias, scale):
    out, lse = _fwd_call(qf, kf, vf, key_bias, scale)
    return out, (qf, kf, vf, key_bias, out, lse)


def _flash_core_bwd(scale, residuals, g):
    qf, kf, vf, key_bias, out, lse = residuals
    dq, dk, dv = _bwd_call(qf, kf, vf, key_bias, out, g, lse, scale)
    return dq, dk, dv, None


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _flash_core_drop(seed, qf, kf, vf, key_bias, scale, rate):
    out, _ = _fwd_drop_call(seed, qf, kf, vf, key_bias, scale, rate)
    return out


def _flash_core_drop_fwd(seed, qf, kf, vf, key_bias, scale, rate):
    out, lse = _fwd_drop_call(seed, qf, kf, vf, key_bias, scale, rate)
    return out, (seed, qf, kf, vf, key_bias, out, lse)


def _flash_core_drop_bwd(scale, rate, residuals, g):
    seed, qf, kf, vf, key_bias, out, lse = residuals
    dq, dk, dv = _bwd_drop_call(
        seed, qf, kf, vf, key_bias, out, g, lse, scale, rate
    )
    return None, dq, dk, dv, None


_flash_core_drop.defvjp(_flash_core_drop_fwd, _flash_core_drop_bwd)


def dropout_keep_mask(
    seed: jax.Array, B: int, H: int, N: int, rate: float
) -> jax.Array:
    """The exact keep-scale tensor ((B, H, N, N) fp32 of {0, 1/(1-rate)})
    the dropout kernels generate internally — host-side oracle for tests;
    never used in the compute path."""
    import numpy as np

    s = np.uint32(np.asarray(seed).ravel()[0])
    out = np.empty((B * H, N, N), np.float32)
    r = np.arange(N, dtype=np.uint32)[:, None]
    c = np.arange(N, dtype=np.uint32)[None, :]
    counter = r * np.uint32(65536) + c
    with np.errstate(over="ignore"):
        for bh in range(B * H):
            bhu = np.uint32(bh)
            key0 = (s ^ (bhu * np.uint32(0x9E3779B9))) | np.uint32(1)
            key1 = (s * np.uint32(0x85EBCA6B)) ^ (bhu + np.uint32(0x165667B1))
            x = counter ^ key0
            x = x * np.uint32(0x85EBCA6B)
            x = x ^ (x >> np.uint32(13))
            x = x ^ key1
            x = x * np.uint32(0xC2B2AE35)
            x = x ^ (x >> np.uint32(16))
            x = x * np.uint32(0x27D4EB2F)
            x = x ^ (x >> np.uint32(15))
            out[bh] = np.where(
                x >= np.uint32(min(int(rate * 2**32), 2**32 - 1)),
                np.float32(1.0 / (1.0 - rate)), np.float32(0.0),
            )
    return jnp.asarray(out.reshape(B, H, N, N))


def _long_primal(qf, kf, vf, key_bias, scale):
    """Forward for sequences past the fused-backward limit: the full-row
    kernel still wins while K/V rows + a (BLOCK_Q, N) score tile fit VMEM
    (≤ FULL_ROW_FWD_MAX); only beyond that is the k-blocked online-softmax
    kernel worth its extra per-program overhead."""
    if qf.shape[1] <= FULL_ROW_FWD_MAX:
        out, _ = _fwd_call(qf, kf, vf, key_bias, scale)
        return out
    return _long_fwd_call(qf, kf, vf, key_bias, scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash_long(qf, kf, vf, key_bias, scale):
    return _long_primal(qf, kf, vf, key_bias, scale)


def _flash_long_fwd(qf, kf, vf, key_bias, scale):
    return _long_primal(qf, kf, vf, key_bias, scale), (qf, kf, vf, key_bias)


def _flash_long_bwd(scale, residuals, g):
    qf, kf, vf, key_bias = residuals
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _xla_reference_flat(q_, k_, v_, key_bias, scale),
        qf, kf, vf,
    )
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_flash_long.defvjp(_flash_long_fwd, _flash_long_bwd)


def _long_fwd_call(qf, kf, vf, key_bias, scale):
    BH, n_pad, D = qf.shape
    B = key_bias.shape[0]
    H = BH // B
    n_q_blocks = n_pad // BLOCK_Q
    n_k_blocks = n_pad // BLOCK_K if n_pad % BLOCK_K == 0 else None
    bk = BLOCK_K if n_k_blocks else BLOCK_Q
    n_k_blocks = n_k_blocks or (n_pad // BLOCK_Q)
    return pl.pallas_call(
        functools.partial(_attn_long_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct(qf.shape, qf.dtype),
        grid=(BH, n_q_blocks, n_k_blocks),
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
            flops=4 * BH * n_pad * n_pad * D,
            bytes_accessed=4 * BH * n_pad * D * qf.dtype.itemsize,
            transcendentals=BH * n_pad * n_pad,
        ),
        interpret=_interpret(),
    )(qf, kf, vf, key_bias)


# ---------------------------------------------------------------- public API


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    bias: jax.Array | None = None,
    scale: float,
    dropout_rate: float = 0.0,
    dropout_seed: jax.Array | None = None,
) -> jax.Array:
    """Differentiable fused attention: Pallas forward + Pallas flash backward
    (≤ LONG_SEQ_THRESHOLD tokens; longer sequences use the k-blocked
    online-softmax forward with an XLA-recompute backward).

    q, k, v: (B, H, N, D); bias: (B, 1, 1, N) additive key-padding bias.
    dropout_rate > 0 (with an int32 `dropout_seed` scalar/1-vector) applies
    attention-prob dropout INSIDE the kernels — the mask is regenerated in
    the backward from (seed, batch·head, position), so no (B, H, N, N)
    mask ever reaches HBM (the reference pays nn.Dropout(attn_drop) on
    materialized probs, vlmo.py:88-95). Requires N ≤ LONG_SEQ_THRESHOLD.
    """
    B, H, N, D = q.shape
    n_pad = _round_up(N, BLOCK_Q)
    use_dropout = dropout_rate > 0.0
    if use_dropout and n_pad > LONG_SEQ_THRESHOLD:
        raise ValueError(
            f"in-kernel attention dropout needs the fused backward "
            f"(N ≤ {LONG_SEQ_THRESHOLD}); got padded N={n_pad}"
        )

    if bias is None:
        key_bias = jnp.zeros((B, 1, N), dtype=jnp.float32)
    else:
        key_bias = bias.astype(jnp.float32).reshape(B, 1, N)
    if n_pad != N:
        key_bias = jnp.pad(
            key_bias, [(0, 0), (0, 0), (0, n_pad - N)], constant_values=NEG_INF
        )
        qkv_pad = [(0, 0), (0, 0), (0, n_pad - N), (0, 0)]
        q = jnp.pad(q, qkv_pad)
        k = jnp.pad(k, qkv_pad)
        v = jnp.pad(v, qkv_pad)

    qf = q.reshape(B * H, n_pad, D)
    kf = k.reshape(B * H, n_pad, D)
    vf = v.reshape(B * H, n_pad, D)

    if use_dropout:
        seed = jnp.asarray(dropout_seed, jnp.int32).reshape(1)
        out = _flash_core_drop(seed, qf, kf, vf, key_bias, scale,
                               float(dropout_rate))
    else:
        core = _flash_long if n_pad > LONG_SEQ_THRESHOLD else _flash_core
        out = core(qf, kf, vf, key_bias, scale)
    out = out.reshape(B, H, n_pad, D)
    return out[:, :, :N, :] if n_pad != N else out
