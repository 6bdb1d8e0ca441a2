"""Pallas fused bf16 whole-MLP: fc1 -> bias -> gelu -> fc2 -> bias in ONE
kernel, hidden activation held in VMEM.

bf16 port of ops/quant_pallas.py's fused_w8a8_mlp (VERDICT r4 ask 2). The
hypothesis under test: bert_mlm's dominant profiled bucket is the XLA MLP
mega-fusion running at ~111 TFLOP/s-of-dot (vs 115 sustained), and the
w8a8 variant of this same fusion already beats XLA at these shapes — so a
bf16 variant may too, by (a) keeping the (M, hidden) intermediate entirely
in VMEM (XLA materializes it to HBM once each way: ~616 MB/layer at
bert_mlm shapes), and (b) running clean dedicated dots instead of XLA's
nested kOutput-producer fusion (measured at ~56 TFLOP/s for fc1 inside
fc2's fusion, BENCH.md r4 "MLP fusion barrier").

Layout mirrors the w8a8 kernel: 1-D grid over m-tiles; BOTH weight
matrices VMEM-resident across the sweep (constant index_map -> DMA'd
once). Fits when (K*H + H*N) bf16 <= ~10 MB — true for base/BERT shapes
(768/3072: 9.4 MB); `fits_vmem` gates larger dims back to the XLA path.

gelu is the tanh form in-kernel (Mosaic lowers neither erf nor erfc on
this target — same note as quant_pallas._mlp_kernel). Max |tanh - exact|
~3e-4, the same order as bf16 resolution at |h|~1, and the custom-vjp
backward differentiates the SAME tanh form, so fwd/bwd are consistent.

Reference parity note: the reference (fanzhongyi/ExploreMultiModal) runs
timm's Mlp (fc1/gelu/drop/fc2/drop, models/vlmo/vlmo.py:21) as discrete
torch ops; this fusion is a TPU-native perf option behind model.mlp_impl.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from exploremultimodal_tpu.ops.quant_pallas import _pad_to

# resident-weight budget: w1 + w2 bf16 must leave room for x/h/out tiles
# inside the ~16 MB/core VMEM (pallas guide); 10 MB admits 768/3072 BERT
# and VLMo-Base shapes, rejects large/huge (1024/4096 -> 33.5 MB)
_RESIDENT_BYTES_CAP = 10 * 1024 * 1024


def fits_vmem(in_dim: int, hidden_dim: int, out_dim: int) -> bool:
    return 2 * (in_dim * hidden_dim + hidden_dim * out_dim) <= _RESIDENT_BYTES_CAP


def _gelu_tanh(h):
    return 0.5 * h * (
        1.0 + jnp.tanh(0.7978845608028654 * (h + 0.044715 * h * h * h))
    )


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    h = jax.lax.dot_general(
        x_ref[:], w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    h = _gelu_tanh(h + b1_ref[:])
    y = jax.lax.dot_general(
        h.astype(x_ref.dtype), w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = (y + b2_ref[:]).astype(out_ref.dtype)


def _mlp_dropout_kernel(threshold, keep_scale, x_ref, w1_ref, b1_ref,
                        w2_ref, b2_ref, bits_ref, out_ref):
    h = jax.lax.dot_general(
        x_ref[:], w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    h = _gelu_tanh(h + b1_ref[:])
    # FastDropout integer-threshold semantics (ops/stochastic.py); i32
    # widen per the Mosaic uge-on-i16 limitation noted in quant_pallas
    keep = bits_ref[:].astype(jnp.int32) >= threshold
    h = jnp.where(keep, h * keep_scale, 0.0)
    y = jax.lax.dot_general(
        h.astype(x_ref.dtype), w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = (y + b2_ref[:]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("threshold", "bm", "interpret"))
def _fused_mlp_padded(x, w1, b1, w2, b2, bits, *, threshold, bm,
                      interpret=False):
    M, K = x.shape
    H = w1.shape[1]
    N = w2.shape[1]
    full = lambda i: (0, 0)
    w_specs = [
        pl.BlockSpec((K, H), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, H), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((H, N), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N), full, memory_space=pltpu.VMEM),
    ]
    x_spec = pl.BlockSpec((bm, K), lambda i: (i, 0), memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=2 * M * (K * H + H * N),
        bytes_accessed=M * K * x.dtype.itemsize + 2 * (K * H + H * N)
        + M * N * x.dtype.itemsize
        + (M * H * 2 if threshold > 0 else 0),
        transcendentals=M * H,
    )
    if threshold > 0:
        keep_scale = 65536.0 / (65536.0 - threshold)
        return pl.pallas_call(
            functools.partial(_mlp_dropout_kernel, threshold, keep_scale),
            grid=(M // bm,),
            in_specs=[x_spec, *w_specs,
                      pl.BlockSpec((bm, H), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((bm, N), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
            cost_estimate=cost,
            interpret=interpret,
        )(x, w1, b1, w2, b2, bits)
    return pl.pallas_call(
        _mlp_kernel,
        grid=(M // bm,),
        in_specs=[x_spec, *w_specs],
        out_specs=pl.BlockSpec((bm, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        cost_estimate=cost,
        interpret=interpret,
    )(x, w1, b1, w2, b2)


def _fwd_impl(x, w1, b1, w2, b2, bits, threshold, interpret):
    *lead, K = x.shape
    H = w1.shape[1]
    N = w2.shape[1]
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    # h tile (bm, H) f32 is the VMEM driver next to the 9.4 MB resident
    # weights: bm=256 -> 3.1 MB at H=3072 (swept on-chip, BENCH.md r5;
    # EMM_MLP_BM overrides for sweeps)
    import os

    bm = int(os.environ.get("EMM_MLP_BM", 0)) or (256 if H <= 3072 else 128)
    bm = min(bm, _pad_to(max(M, 1), 32))
    Mp = _pad_to(max(M, 1), bm)
    bits2 = None
    if threshold > 0:
        bits2 = bits.reshape(-1, H)
        if Mp != M:
            bits2 = jnp.pad(bits2, ((0, Mp - M), (0, 0)))
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    y = _fused_mlp_padded(
        x2,
        w1.astype(x.dtype),
        b1.reshape(1, H).astype(jnp.float32),
        w2.astype(x.dtype),
        b2.reshape(1, N).astype(jnp.float32),
        bits2,
        threshold=threshold,
        bm=bm,
        interpret=interpret,
    )
    return y[:M].reshape(*lead, N)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_bf16_mlp(x, w1, b1, w2, b2, interpret: bool = False):
    """One-kernel bf16 MLP: gelu_tanh(x @ w1 + b1) @ w2 + b2.

    Forward holds the (M, hidden) intermediate in VMEM. Backward is the
    exact VJP of this forward (tanh-form gelu differentiated), computed as
    plain XLA dots with bf16 recompute of the hidden — the same
    rematerialization XLA's checkpoint policy would emit.
    """
    return _fwd_impl(x, w1, b1, w2, b2, None, 0, interpret)


def _vjp_fwd(x, w1, b1, w2, b2, interpret):
    return _fwd_impl(x, w1, b1, w2, b2, None, 0, interpret), (x, w1, b1, w2)


def _vjp_bwd(interpret, res, g):
    x, w1, b1, w2 = res
    x2 = x.reshape(-1, x.shape[-1])
    g2 = g.reshape(-1, g.shape[-1])
    h1 = x2 @ w1.astype(x.dtype) + b1.astype(x.dtype)
    act, dact_fn = jax.vjp(lambda t: jax.nn.gelu(t, approximate=True), h1)
    dh = dact_fn(g2 @ w2.T.astype(g.dtype))[0]
    dx = (dh @ w1.T.astype(dh.dtype)).reshape(x.shape).astype(x.dtype)
    dw1 = (x2.T @ dh).astype(w1.dtype)
    db1 = jnp.sum(dh, axis=0).astype(b1.dtype)
    dw2 = (act.T @ g2).astype(w2.dtype)
    db2 = jnp.sum(g2, axis=0).astype(b1.dtype)
    return dx, dw1, db1, dw2, db2


fused_bf16_mlp.defvjp(_vjp_fwd, _vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_bf16_mlp_dropout(x, w1, b1, w2, b2, bits,
                           threshold: int, interpret: bool = False):
    """fused_bf16_mlp + hidden dropout between gelu and fc2.

    bits: uint16 draws of shape x.shape[:-1] + (hidden,); an element is
    KEPT when bits >= threshold, scaled by 65536/(65536-threshold)
    (FastDropout semantics). Backward applies the identical mask.
    """
    return _fwd_impl(x, w1, b1, w2, b2, bits, threshold, interpret)


def _vjpd_fwd(x, w1, b1, w2, b2, bits, threshold, interpret):
    y = _fwd_impl(x, w1, b1, w2, b2, bits, threshold, interpret)
    return y, (x, w1, b1, w2, bits)


def _vjpd_bwd(threshold, interpret, res, g):
    import numpy as np

    x, w1, b1, w2, bits = res
    x2 = x.reshape(-1, x.shape[-1])
    g2 = g.reshape(-1, g.shape[-1])
    bits2 = bits.reshape(-1, bits.shape[-1])
    keep_scale = jnp.asarray(65536.0 / (65536.0 - threshold), x.dtype)
    h1 = x2 @ w1.astype(x.dtype) + b1.astype(x.dtype)
    act, dact_fn = jax.vjp(lambda t: jax.nn.gelu(t, approximate=True), h1)
    keep = bits2.astype(jnp.int32) >= threshold
    dropped = jnp.where(keep, act * keep_scale, jnp.zeros_like(act))
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


fused_bf16_mlp_dropout.defvjp(_vjpd_fwd, _vjpd_bwd)
