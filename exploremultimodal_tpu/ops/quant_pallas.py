"""Pallas fused W8A8 matmul: in-VMEM dynamic quantization + int8 MXU dot.

Why this kernel exists (BENCH.md "int8 MXU study"): XLA compiles dynamic
activation quantization as separate HBM passes — a full absmax read of x,
a round/clip pass that MATERIALIZES the int8 copy in HBM, then the dot
reads it back (~6 bytes moved per activation element vs 2 for bf16). That
extra traffic fully ate the int8 MXU's 2x rate in `ops/quant.py`'s XLA
path (bert_mlm fwd 136->144 ms). The fix XLA's emitter cannot express is
fusing quantization INTO the matmul's operand pipeline:

  - x tiles stream HBM->VMEM in bf16 exactly once (same bytes as bf16
    matmul),
  - per-ROW absmax/scale + round/clip to int8 happen in VMEM at the
    m-tile's first n-step, cached in scratch for the remaining n-steps,
  - the MXU runs int8 x int8 -> int32 at ~2x the bf16 rate
    (`scripts/microbench_int8.py`: 315 TOP/s vs 164 TFLOP/s at 8k^3),
  - dequant (int32 * row_scale * col_scale) fuses into the accumulator
    epilogue in VMEM.

Per-row ("per-token") activation scales are FINER than ops/quant.py's
per-tensor scale, so accuracy is strictly better than the XLA path this
replaces. Weights arrive pre-quantized (int8 + per-output-channel f32
scales) — for params that cost is one small XLA pass per step (cacheable
at serving time).

Grid is (M/bm, N/bn), n innermost; K is kept whole in VMEM (VLMo/BERT
K <= 4096 -> x tile at bm=256 is <= 2 MB bf16). The f32 accumulator tile
and int8 dot stay entirely in VMEM; out streams back once.

Reference parity note: the reference (fanzhongyi/ExploreMultiModal) trains
fp16 AMP via torch.cuda.amp (utils/utils.py) and ships no int8 path; this
is a beyond-the-reference TPU-native option, off by default
(model.quantize='none').
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-8


def _fused_kernel(x_ref, qw_ref, sw_ref, out_ref, qx_ref, sx_ref):
    """One (bm, bn) output tile; n is the innermost grid dim.

    x_ref  (bm, K) bf16/f32 — same m-tile across the inner n sweep
    qw_ref (K, bn) int8     — pre-quantized weight tile
    sw_ref (1, bn) f32      — per-output-channel weight scales
    out_ref(bm, bn)         — output tile
    qx_ref (bm, K) int8     — scratch: quantized x tile (persists over n)
    sx_ref (bm, 1) f32      — scratch: per-row activation scales
    """

    @pl.when(pl.program_id(1) == 0)
    def _quantize_rows():
        x = x_ref[:].astype(jnp.float32)
        absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
        scale = jnp.maximum(absmax, _EPS) * (1.0 / 127.0)
        sx_ref[:] = scale
        q = jnp.round(x * pl.reciprocal(scale, approx=False))
        qx_ref[:] = jnp.clip(q, -127.0, 127.0).astype(jnp.int8)

    acc = jax.lax.dot_general(
        qx_ref[:],
        qw_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out_ref[:] = (
        acc.astype(jnp.float32) * sx_ref[:] * sw_ref[:]
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "interpret"))
def _fused_w8a8_padded(x, qw, sw, *, bm, bn, interpret=False):
    M, K = x.shape
    N = qw.shape[1]
    grid = (M // bm, N // bn)
    return pl.pallas_call(
        _fused_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, K), jnp.int8),
            pltpu.VMEM((bm, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            # int8 MACs counted as flops so the scheduler sees MXU work
            flops=2 * M * N * K,
            bytes_accessed=M * K * x.dtype.itemsize + K * N + 4 * N
            + M * N * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, qw, sw)


def quantize_weights(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-output-channel symmetric int8 weight quantization.

    w (K, N) -> (qw int8 (K, N), sw f32 (1, N)) with w ~= qw * sw. One
    small XLA pass over the params; at serving time cache the result.
    """
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True)
    sw = jnp.maximum(absmax, _EPS) / 127.0
    qw = jnp.clip(jnp.round(w.astype(jnp.float32) / sw), -127.0, 127.0)
    return qw.astype(jnp.int8), sw


def _pad_to(v: int, m: int) -> int:
    return -(-v // m) * m


def _pick_bn(N: int, bn: int) -> int:
    """Largest lane-aligned tile <= bn that divides N (no padded columns);
    falls back to bn with padding when N has no such divisor."""
    for d in range(bn, 127, -128):
        if N % d == 0:
            return d
    return bn


def fused_w8a8_matmul(
    x: jax.Array,
    qw: jax.Array,
    sw: jax.Array,
    *,
    bm: int | None = None,
    bn: int = 768,
    interpret: bool = False,
) -> jax.Array:
    """y = dequant(row_quant(x) @ qw): (..., K) x (K, N) -> (..., N).

    x is bf16/f32 with any leading batch dims; qw/sw from
    `quantize_weights`. Leading dims are flattened to M and padded to the
    m-tile; N is padded to the n-tile only when no lane-aligned divisor
    exists (weights are param-sized, the pad is one-time under jit).

    Tile defaults are from the on-chip sweep (BENCH.md "Pallas fused W8A8"):
    bn=768 with bm=512 for MLP-sized dots (1.36-1.39x bf16) and bm=256 for
    square ~768 dots (1.12x; bm=512 regresses there).
    """
    *lead, K = x.shape
    N = qw.shape[1]
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    if bm is None:
        bm = 512 if (K >= 2048 or N >= 2048) else 256
    bm_eff = min(bm, _pad_to(max(M, 1), 32))
    bn_eff = _pick_bn(N, bn)
    Mp, Np = _pad_to(max(M, 1), bm_eff), _pad_to(N, bn_eff)
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    if Np != N:
        qw = jnp.pad(qw, ((0, 0), (0, Np - N)))
        sw = jnp.pad(sw, ((0, 0), (0, Np - N)))
    y = _fused_w8a8_padded(x2, qw, sw, bm=bm_eff, bn=bn_eff, interpret=interpret)
    return y[:M, :N].reshape(*lead, N)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def pallas_quant_dot(x: jax.Array, kernel: jax.Array, interpret: bool = False):
    """Drop-in for `x @ kernel` with the fused Pallas W8A8 forward.

    Backward is the straight-through estimator at full precision — the
    exact dots nn.Dense's backward would run (same recipe and tests as
    ops/quant.py:quant_dot; QAT-viable).
    """
    qw, sw = quantize_weights(kernel)
    return fused_w8a8_matmul(x, qw, sw, interpret=interpret)


def _pqd_fwd(x, kernel, interpret):
    return pallas_quant_dot(x, kernel, interpret), (x, kernel)


def _pqd_bwd(interpret, res, g):
    x, kernel = res
    dx = jax.lax.dot_general(
        g, kernel, (((g.ndim - 1,), (1,)), ((), ()))
    ).astype(x.dtype)
    dw = jax.lax.dot_general(
        x.reshape(-1, x.shape[-1]),
        g.reshape(-1, g.shape[-1]),
        (((0,), (0,)), ((), ())),
    ).astype(kernel.dtype)
    return dx, dw


pallas_quant_dot.defvjp(_pqd_fwd, _pqd_bwd)


# ---------------------------------------------------------------------------
# Whole-MLP fusion: fc1 -> bias -> exact gelu -> fc2 -> bias in ONE kernel.
#
# Profiling the per-dense pallas path in the full model (BENCH.md "Pallas
# fused W8A8") showed the win evaporating because the exact-gelu between
# fc1 and fc2 — which XLA fuses into the bf16 matmul epilogue — became a
# standalone VPU pass over the (M, hidden) tensor (~2.3 ms/layer at BERT
# shapes). Fusing the WHOLE MLP removes that pass and, better, keeps the
# (M, hidden) intermediate entirely in VMEM: HBM traffic per layer drops
# from ~775 MB (x + fc1_out + fc2_in + out) to ~160 MB (x + weights + out),
# and both dots run on the int8 MXU.
#
# Grid is 1-D over m-tiles; both quantized weight matrices stay resident in
# VMEM across the whole sweep (their index_map is constant, so they are
# DMA'd once). Per m-tile: per-row quantize x -> int8 dot1 -> dequant +
# bias -> exact gelu (erf) -> per-row requantize -> int8 dot2 -> dequant +
# bias -> store.
# ---------------------------------------------------------------------------


def _row_quant(x_f32):
    absmax = jnp.max(jnp.abs(x_f32), axis=1, keepdims=True)
    scale = jnp.maximum(absmax, _EPS) * (1.0 / 127.0)
    q = jnp.round(x_f32 * pl.reciprocal(scale, approx=False))
    return jnp.clip(q, -127.0, 127.0).astype(jnp.int8), scale


def _mlp_kernel(x_ref, qw1_ref, sw1_ref, b1_ref, qw2_ref, sw2_ref, b2_ref,
                out_ref):
    qx, sx = _row_quant(x_ref[:].astype(jnp.float32))
    h = jax.lax.dot_general(
        qx, qw1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    h = h.astype(jnp.float32) * sx * sw1_ref[:] + b1_ref[:]
    # tanh-form gelu: Mosaic lowers neither erf nor erfc, so the exact
    # form can't run in-kernel. Max |tanh-form - exact| ~3e-4 — an order
    # below the int8 activation-quantization envelope this kernel already
    # accepts; the bf16 paths keep the exact erf gelu.
    h = 0.5 * h * (1.0 + jnp.tanh(0.7978845608028654 * (h + 0.044715 * h * h * h)))
    qh, sh = _row_quant(h)
    y = jax.lax.dot_general(
        qh, qw2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out_ref[:] = (
        y.astype(jnp.float32) * sh * sw2_ref[:] + b2_ref[:]
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bm", "interpret"))
def _fused_mlp_padded(x, qw1, sw1, b1, qw2, sw2, b2, *, bm, interpret=False):
    M, K = x.shape
    H = qw1.shape[1]
    N = qw2.shape[1]
    full = lambda i: (0, 0)
    return pl.pallas_call(
        _mlp_kernel,
        grid=(M // bm,),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, H), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, N), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), full, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, N), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * (K * H + H * N),
            bytes_accessed=M * K * x.dtype.itemsize + K * H + H * N
            + M * N * x.dtype.itemsize,
            transcendentals=M * H,
        ),
        interpret=interpret,
    )(x, qw1, sw1, b1, qw2, sw2, b2)


def _mlp_fwd_impl(x, w1, b1, w2, b2, interpret):
    *lead, K = x.shape
    H = w1.shape[1]
    N = w2.shape[1]
    qw1, sw1 = quantize_weights(w1)
    qw2, sw2 = quantize_weights(w2)
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    # VMEM budget: resident weights (K*H + H*N int8) + per-tile x/h/out;
    # shrink bm for big hidden dims so h (bm, H) f32 stays comfortable
    bm = 256 if H <= 3072 else 128
    bm = min(bm, _pad_to(max(M, 1), 32))
    Mp = _pad_to(max(M, 1), bm)
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    y = _fused_mlp_padded(
        x2,
        qw1,
        sw1,
        b1.reshape(1, H).astype(jnp.float32),
        qw2,
        sw2,
        b2.reshape(1, N).astype(jnp.float32),
        bm=bm,
        interpret=interpret,
    )
    return y[:M].reshape(*lead, N)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_w8a8_mlp(x, w1, b1, w2, b2, interpret: bool = False):
    """One-kernel W8A8 MLP: gelu_exact(x @ w1 + b1) @ w2 + b2.

    Forward runs both dots on the int8 MXU with the (M, hidden)
    intermediate held in VMEM (never written to HBM). Backward is the
    straight-through estimator with bf16/f32 recompute of the hidden
    activation — the same dots and dtypes the unquantized MLP's backward
    would run, so training matches the bf16 recipe up to forward
    quantization noise (the standard W8A8 QAT contract, ops/quant.py).
    """
    return _mlp_fwd_impl(x, w1, b1, w2, b2, interpret)


def _mlp_vjp_fwd(x, w1, b1, w2, b2, interpret):
    return _mlp_fwd_impl(x, w1, b1, w2, b2, interpret), (x, w1, b1, w2)


def _mlp_vjp_bwd(interpret, res, g):
    x, w1, b1, w2 = res
    x2 = x.reshape(-1, x.shape[-1])
    g2 = g.reshape(-1, g.shape[-1])
    # recompute the hidden pre-activation at the compute dtype (bf16 remat —
    # the same recompute XLA's checkpoint policy would emit)
    h1 = x2 @ w1.astype(x.dtype) + b1.astype(x.dtype)
    act = jax.nn.gelu(h1, approximate=False)
    dact = jax.vjp(lambda t: jax.nn.gelu(t, approximate=False), h1)[1]
    dh = dact(g2 @ w2.T.astype(g.dtype))[0]
    dx = (dh @ w1.T.astype(dh.dtype)).reshape(x.shape).astype(x.dtype)
    dw1 = (x2.T @ dh).astype(w1.dtype)
    db1 = jnp.sum(dh, axis=0).astype(b1.dtype)
    dw2 = (act.T @ g2).astype(w2.dtype)
    db2 = jnp.sum(g2, axis=0).astype(b1.dtype)
    return dx, dw1, db1, dw2, db2


fused_w8a8_mlp.defvjp(_mlp_vjp_fwd, _mlp_vjp_bwd)


# -- fused MLP with in-kernel hidden dropout ---------------------------------
# The training recipe keeps hidden dropout between gelu and fc2
# (model.drop_rate, reference nn.Dropout semantics via the uint16
# integer-threshold trick of ops/stochastic.py:FastDropout). The mask bits
# are drawn OUTSIDE the kernel (XLA hardware RBG, one uint16 per hidden
# element) and consumed by both the Pallas forward (compare+scale in VMEM)
# and the straight-through backward (same compare in XLA), so fwd/bwd see
# the identical mask without the kernel having to export it.


def _mlp_dropout_kernel(threshold, keep_scale, x_ref, qw1_ref, sw1_ref,
                        b1_ref, qw2_ref, sw2_ref, b2_ref, bits_ref, out_ref):
    qx, sx = _row_quant(x_ref[:].astype(jnp.float32))
    h = jax.lax.dot_general(
        qx, qw1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    h = h.astype(jnp.float32) * sx * sw1_ref[:] + b1_ref[:]
    h = 0.5 * h * (1.0 + jnp.tanh(0.7978845608028654 * (h + 0.044715 * h * h * h)))
    # Mosaic has no 16-bit unsigned compare on this target ("Target does
    # not support this comparison" for uge on vector<i16>): widen to i32
    keep = bits_ref[:].astype(jnp.int32) >= threshold
    h = jnp.where(keep, h * keep_scale, 0.0)
    qh, sh = _row_quant(h)
    y = jax.lax.dot_general(
        qh, qw2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out_ref[:] = (
        y.astype(jnp.float32) * sh * sw2_ref[:] + b2_ref[:]
    ).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("threshold", "bm", "interpret")
)
def _fused_mlp_dropout_padded(x, qw1, sw1, b1, qw2, sw2, b2, bits, *,
                              threshold, bm, interpret=False):
    M, K = x.shape
    H = qw1.shape[1]
    N = qw2.shape[1]
    full = lambda i: (0, 0)
    keep_scale = 65536.0 / (65536.0 - threshold)
    return pl.pallas_call(
        functools.partial(_mlp_dropout_kernel, threshold, keep_scale),
        grid=(M // bm,),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, H), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, N), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, N), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * (K * H + H * N),
            bytes_accessed=M * K * x.dtype.itemsize + K * H + H * N
            + M * H * 2 + M * N * x.dtype.itemsize,
            transcendentals=M * H,
        ),
        interpret=interpret,
    )(x, qw1, sw1, b1, qw2, sw2, b2, bits)


def _mlp_dropout_fwd_impl(x, w1, b1, w2, b2, bits, threshold, interpret):
    *lead, K = x.shape
    H = w1.shape[1]
    N = w2.shape[1]
    qw1, sw1 = quantize_weights(w1)
    qw2, sw2 = quantize_weights(w2)
    x2 = x.reshape(-1, K)
    bits2 = bits.reshape(-1, H)
    M = x2.shape[0]
    bm = 256 if H <= 3072 else 128
    bm = min(bm, _pad_to(max(M, 1), 32))
    Mp = _pad_to(max(M, 1), bm)
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
        bits2 = jnp.pad(bits2, ((0, Mp - M), (0, 0)))
    y = _fused_mlp_dropout_padded(
        x2, qw1, sw1,
        b1.reshape(1, H).astype(jnp.float32),
        qw2, sw2,
        b2.reshape(1, N).astype(jnp.float32),
        bits2, threshold=threshold, bm=bm, interpret=interpret,
    )
    return y[:M].reshape(*lead, N)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_w8a8_mlp_dropout(x, w1, b1, w2, b2, bits,
                           threshold: int, interpret: bool = False):
    """fused_w8a8_mlp + hidden dropout between gelu and fc2.

    bits: uint16 PRNG draws of shape x.shape[:-1] + (hidden,); an element
    is KEPT when bits >= threshold and scaled by 65536/(65536-threshold)
    (FastDropout's integer-threshold semantics, ops/stochastic.py).
    Backward applies the identical mask in the straight-through recompute.
    """
    return _mlp_dropout_fwd_impl(x, w1, b1, w2, b2, bits, threshold, interpret)


def _mlpd_vjp_fwd(x, w1, b1, w2, b2, bits, threshold, interpret):
    y = _mlp_dropout_fwd_impl(x, w1, b1, w2, b2, bits, threshold, interpret)
    return y, (x, w1, b1, w2, bits)


def _mlpd_vjp_bwd(threshold, interpret, res, g):
    import numpy as np

    x, w1, b1, w2, bits = res
    x2 = x.reshape(-1, x.shape[-1])
    g2 = g.reshape(-1, g.shape[-1])
    bits2 = bits.reshape(-1, bits.shape[-1])
    keep_scale = jnp.asarray(65536.0 / (65536.0 - threshold), x.dtype)
    h1 = x2 @ w1.astype(x.dtype) + b1.astype(x.dtype)
    act = jax.nn.gelu(h1, approximate=False)
    keep = bits2 >= jnp.uint16(threshold)
    dropped = jnp.where(keep, act * keep_scale, jnp.zeros_like(act))
    dact_fn = jax.vjp(lambda t: jax.nn.gelu(t, approximate=False), h1)[1]
    dh_post = g2 @ w2.T.astype(g.dtype)
    dh_post = jnp.where(keep, dh_post * keep_scale, jnp.zeros_like(dh_post))
    dh = dact_fn(dh_post)[0]
    dx = (dh @ w1.T.astype(dh.dtype)).reshape(x.shape).astype(x.dtype)
    dw1 = (x2.T @ dh).astype(w1.dtype)
    db1 = jnp.sum(dh, axis=0).astype(b1.dtype)
    dw2 = (dropped.T @ g2).astype(w2.dtype)
    db2 = jnp.sum(g2, axis=0).astype(b1.dtype)
    dbits = np.zeros(bits.shape, jax.dtypes.float0)
    return dx, dw1, db1, dw2, db2, dbits


fused_w8a8_mlp_dropout.defvjp(_mlpd_vjp_fwd, _mlpd_vjp_bwd)
