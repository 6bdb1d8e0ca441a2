"""W8A8 quantized matmul for the v5e MXU (2x int8 peak over bf16).

The v5e MXU runs int8 x int8 -> int32 dots at ~2x the bf16 rate (measured
`scripts/microbench_int8.py`: 315 TOP/s vs 164 TFLOP/s at 8k^3, 1.5-1.6x at
transformer-sized dots). Once the bf16 headline step is at its per-chip
roofline (BENCH.md round 3 "per-chip ceiling accounting"), precision is the
only remaining throughput lever on one chip.

`quant_dot` is a drop-in for `x @ kernel` with:

- forward: dynamic symmetric quantization — per-tensor activation scale
  (absmax/127), per-output-channel kernel scale — int8 x int8 -> int32 MXU
  dot, dequantized to the activation dtype. No calibration or state.
- backward: straight-through estimator at full precision — dx = g @ w^T and
  dw = x^T @ g run as ordinary bf16/f32 dots on the UNQUANTIZED operands, so
  optimizer updates see exact gradients of the dequantized forward's
  linearization (the standard W8A8 QAT recipe; quantization noise appears
  only in the forward activations).

`QuantDense` wraps it with nn.Dense's exact parameter tree (kernel (K, N),
bias (N,), lecun_normal init) so checkpoints, torch imports
(models/import_torch.py) and partitioning rules are interchangeable with
nn.Dense — quantization is a pure compute-path toggle (`model.quantize`).

Reference parity note: the reference trains fp16 AMP (torch.cuda.amp,
utils/utils.py); it ships no int8 path. This is a beyond-the-reference
option, off by default; the parity configs keep bf16 everywhere.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax.linen.dtypes import promote_dtype

Dtype = Any

_EPS = 1e-8


def _quantize_int8(t: jax.Array, axis=None) -> tuple[jax.Array, jax.Array]:
    """Symmetric int8 quantization; scale over `axis` (None = per-tensor).

    Returns (q, scale) with t ~= q * scale. scale is fp32 and keeps the
    reduced dims so it broadcasts back against t's shape.
    """
    absmax = jnp.max(jnp.abs(t.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = jnp.maximum(absmax, _EPS) / 127.0
    q = jnp.clip(jnp.round(t.astype(jnp.float32) / scale), -127.0, 127.0)
    return q.astype(jnp.int8), scale


def _int8_forward(x: jax.Array, kernel: jax.Array) -> jax.Array:
    qx, sx = _quantize_int8(x)  # per-tensor: sx shape (1,)*x.ndim
    qw, sw = _quantize_int8(kernel, axis=0)  # per-out-channel: (1, N)
    y = jax.lax.dot_general(
        qx,
        qw,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    # dequant: sx is scalar-like, sw broadcasts over the output channel dim
    out = y.astype(jnp.float32) * (sx.reshape(()) * sw.reshape((1,) * (y.ndim - 1) + (-1,)))
    return out.astype(x.dtype)


@jax.custom_vjp
def quant_dot(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """int8-MXU forward of `x @ kernel`, straight-through bf16 backward."""
    return _int8_forward(x, kernel)


def _quant_dot_fwd(x, kernel):
    return _int8_forward(x, kernel), (x, kernel)


def _quant_dot_bwd(res, g):
    x, kernel = res
    # STE: gradients of the unquantized dot, full precision (same dots and
    # dtypes nn.Dense's backward would run, so dx/dw match bf16 training).
    dx = jax.lax.dot_general(
        g, kernel, (((g.ndim - 1,), (1,)), ((), ()))
    ).astype(x.dtype)
    dw = jax.lax.dot_general(
        x.reshape(-1, x.shape[-1]),
        g.reshape(-1, g.shape[-1]),
        (((0,), (0,)), ((), ())),
    ).astype(kernel.dtype)
    return dx, dw


quant_dot.defvjp(_quant_dot_fwd, _quant_dot_bwd)


class QuantDense(nn.Module):
    """nn.Dense with the forward matmul routed through the int8 MXU.

    Identical parameter tree to nn.Dense (kernel (in, features) + optional
    bias, fp32 params, lecun_normal init) — checkpoints and partitioning
    specs are interchangeable. Only the forward dot is quantized (W8A8,
    dynamic activation / per-channel weight scales); bias add and
    all gradients stay at the activation/param precision.

    impl selects the forward emitter:
      "xla"    — per-tensor activation scale, separate XLA quantize passes
                 (materializes the int8 copy in HBM; BENCH.md int8 study)
      "pallas" — ops/quant_pallas.py fused kernel: per-ROW activation
                 scales computed in VMEM, int8 MXU dot, no HBM int8 copy
                 (auto-interpreted when running on CPU, e.g. in tests)
    """

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    impl: str = "xla"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (x.shape[-1], self.features),
            self.param_dtype,
        )
        bias = (
            self.param(
                "bias", nn.initializers.zeros, (self.features,), self.param_dtype
            )
            if self.use_bias
            else None
        )
        x, kernel, bias = promote_dtype(x, kernel, bias, dtype=self.dtype)
        if self.impl == "pallas":
            from exploremultimodal_tpu.ops.quant_pallas import pallas_quant_dot

            y = pallas_quant_dot(x, kernel, jax.default_backend() == "cpu")
        else:
            y = quant_dot(x, kernel)
        if bias is not None:
            y = y + bias
        return y


def dense(quantize: str, features: int, *, use_bias: bool = True, dtype=None,
          name: str | None = None) -> nn.Module:
    """Pick the Dense implementation for `model.quantize`.

    "none" -> nn.Dense (bf16/f32 MXU path); "w8a8" -> QuantDense (int8 MXU
    forward via separate XLA quantize passes); "w8a8_pallas" -> QuantDense
    with the fused Pallas kernel (quantization inside the matmul's VMEM
    pipeline, ops/quant_pallas.py). Same parameter tree in all cases;
    backward is always the straight-through full-precision dot.
    """
    if quantize == "none":
        return nn.Dense(features, use_bias=use_bias, dtype=dtype, name=name)
    if quantize == "w8a8":
        return QuantDense(features, use_bias=use_bias, dtype=dtype, name=name)
    if quantize == "w8a8_pallas":
        return QuantDense(
            features, use_bias=use_bias, dtype=dtype, name=name, impl="pallas"
        )
    raise ValueError(
        f"unknown model.quantize={quantize!r} "
        "(none|w8a8|w8a8_pallas|w8a8_pallas_mlp)"
    )


class DenseParams(nn.Module):
    """Declares nn.Dense's exact parameter tree (kernel + bias, same init
    stream) WITHOUT computing — for fused kernels that consume the raw
    params of several layers at once (ops/quant_pallas.py fused MLP) while
    keeping checkpoints/partitioning identical to the unfused modules."""

    features: int

    @nn.compact
    def __call__(self, in_dim: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (in_dim, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return kernel, bias


def site_mode(quantize: str, site: str) -> str:
    """Resolve a model.quantize value for a callsite ('qkv'|'proj'|'mlp').

    Site-restricted modes (BENCH.md "Pallas fused W8A8" step A/Bs):
      'w8a8_pallas_mlp'    — fused int8 kernel for fc1/fc2 only (the MLP
                             shapes gain 1.2-1.4x in isolation), attention
                             denses stay bf16.
      'w8a8_pallas_noproj' — fc1/fc2 + qkv quantized; proj stays bf16 (its
                             input is a head-transpose XLA can fold into a
                             bf16 dot but must materialize for an opaque
                             kernel).
    """
    if quantize == "w8a8_pallas_mlp":
        return "w8a8_pallas" if site == "mlp" else "none"
    if quantize == "w8a8_pallas_noproj":
        return "none" if site == "proj" else "w8a8_pallas"
    return quantize
