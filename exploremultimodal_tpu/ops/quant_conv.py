"""W8A8 quantized convolution for the v5e int8 MXU — dVAE tokenizer path.

The dVAE tokenize bench runs AT the bf16 sustained matmul roofline
(BENCH.md round 3: 118 TFLOP/s achieved ≈ 103% of the 115 TFLOP/s
sustained rate), so the only remaining single-chip lever is the MXU's
int8 mode (~2x bf16, measured 315 TOP/s in scripts/microbench_int8.py).
The tokenizer is frozen (stop_gradient in the MIM objective,
reference models/vlmo/vlmo_module.py:73 + modeling_discrete_vae.py:246)
and its consumers take an argmax over 8192 logits, so it tolerates
forward-only quantization noise better than any other compute in the
framework: no backward exists, and only token-id agreement matters.

Recipe (same as ops/quant.py `quant_dot`, adapted to NHWC convs):

- activations: dynamic symmetric per-tensor int8 (absmax/127)
- weights: symmetric per-OUTPUT-CHANNEL int8 over (kh, kw, cin)
- int8 x int8 -> int32 accumulate, dequantize by sx * sw[co]

Two emitters, A/B'd on-chip (BENCH.md "dvae int8" study):

- "direct": `lax.conv_general_dilated` on int8 operands with
  preferred_element_type=int32 — one conv op, XLA's conv emitter decides
  the MXU mapping.
- "shifted": the k x k conv decomposed into k^2 channel-contraction
  `dot_general`s over spatially shifted int8 views, accumulated in
  int32. This is the mapping the MXU actually executes for SAME convs;
  spelling it out bypasses any bf16-only assumptions in the conv
  emitter at the cost of k^2 reads of the (int8, so 4x smaller than
  fp32) activation tensor.

No custom VJP: the tokenizer path is inference-only. If a gradient is
ever traced through, JAX differentiates the quantize ops (zero/undefined
grads) — callers must keep the stop_gradient the MIM objective already
has.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from exploremultimodal_tpu.ops.quant import _quantize_int8


def _dequant(y32: jax.Array, sx: jax.Array, sw: jax.Array, dtype) -> jax.Array:
    # sx is scalar-like (1,1,1,1); sw carries the out-channel axis (1,1,1,Co)
    return (y32.astype(jnp.float32) * (sx.reshape(()) * sw.reshape(1, 1, 1, -1))).astype(dtype)


def quant_conv(
    x: jax.Array,
    kernel: jax.Array,
    pad: int,
    impl: str = "direct",
) -> jax.Array:
    """W8A8 forward of a stride-1 SAME-ish NHWC conv (torch padding=(k-1)//2).

    x: (N, H, W, Ci) float; kernel: (kh, kw, Ci, Co) float (flax HWIO).
    Returns (N, H, W, Co) in x.dtype. `pad` is the symmetric spatial pad,
    matching models/dvae.py `_Conv`.
    """
    qx, sx = _quantize_int8(x)
    qw, sw = _quantize_int8(kernel, axis=(0, 1, 2))
    if impl == "direct":
        y = lax.conv_general_dilated(
            qx,
            qw,
            window_strides=(1, 1),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
    elif impl == "shifted":
        y = _shifted_int8_conv(qx, qw, pad)
    else:
        raise ValueError(f"unknown quant_conv impl={impl!r} (direct|shifted)")
    return _dequant(y, sx, sw, x.dtype)


def _shifted_int8_conv(qx: jax.Array, qw: jax.Array, pad: int) -> jax.Array:
    """k x k int8 conv as k^2 shifted channel dots, int32 accumulate.

    int8 zero-padding is exact, so padding before shifting preserves the
    conv semantics bit-for-bit vs the direct emitter.
    """
    kh, kw, _, _ = qw.shape
    n, h, w, _ = qx.shape
    if pad:
        qx = jnp.pad(qx, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    out = None
    for i in range(kh):
        for j in range(kw):
            # (N, H, W, Ci) view shifted by (i, j) - contraction over Ci
            patch = lax.slice(
                qx, (0, i, j, 0), (n, i + h, j + w, qx.shape[-1])
            )
            part = lax.dot_general(
                patch,
                qw[i, j],
                (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            out = part if out is None else out + part
    return out
