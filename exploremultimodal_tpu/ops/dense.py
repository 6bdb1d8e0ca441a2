"""Dense layer with an MXU-routed bias gradient.

The round-3 headline profile (BENCH.md) shows ~29 ms/step of reduce-rooted
fusions — dominated by Dense bias gradients: `sum over (B, N)` of a bf16
(B, N, C) cotangent into an fp32 (C,) vector. XLA lowers these onto the VPU
and freely duplicates elementwise producer chains into each reduce fusion,
so the measured cost (0.6-0.9 ms each) is far above the bandwidth bound of
the tensor being reduced (~0.15 ms standalone, scripts/microbench_biasgrad).

`MxuDense` is a drop-in for `flax.linen.Dense` (same param names/shapes/
inits, same promote-dtype semantics) whose bias gradient is computed as a
(1, B·N) × (B·N, C) dot: ones-vector × cotangent, fp32 MXU accumulation.
Multiplying by 1.0 is exact in bf16 and the MXU accumulates in fp32, so the
numerics match the fp32-converted VPU reduce up to summation order.

MEASURED NEGATIVE at the headline step (BENCH.md round 3, "MXU bias-grad
A/B"): swapping MxuDense into every Mlp fc1/fc2 and attention proj moved
the b32 pretrain step 205.4 → 206.5 ms — a wash. The standalone microbench
(scripts/microbench_biasgrad.py) shows why: the bare reduce already runs at
the same bandwidth as the ones-dot at these shapes; the profiled cost of
the reduce fusions is duplicated *producer* chains, which the dot variant
pays identically. Kept as an ops utility with exact-numerics tests; NOT
used by the production model.

Reference parity: the reference's nn.Linear bias grads are cuBLAS/ATen
reduces; this only changes how the same contraction is scheduled on TPU.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax.linen.dtypes import promote_dtype

Dtype = Any


@jax.custom_vjp
def barrier_cotangent(x: jax.Array) -> jax.Array:
    """Identity whose BACKWARD wraps the cotangent in an optimization barrier.

    Placed on a Dense pre-activation (e.g. the fc1 output), this forces XLA
    to materialize the incoming cotangent ONCE before its three consumers
    (kernel-grad dot, bias-grad reduce, input-grad dot) instead of
    duplicating the producer chain (dropout-bwd × GELU-bwd at MLP widths)
    into each fusion — the duplication the round-3 profile measured as
    ~29 ms/step of reduce-rooted fusions (BENCH.md "MXU bias-grad A/B":
    the reduce itself is bandwidth-optimal; the producers are the cost).
    Numerically an exact no-op in both passes.

    Measured on the fc1 pre-activation of every MLP in the headline step
    (BENCH.md round 3): 207.4 ms vs 205.4 baseline, bytes-accessed
    190.8 → 194.2 GB — materialize-once LOSES to recompute-per-consumer,
    like every store-vs-recompute A/B on this chip (the chain's inputs are
    ~the same bytes as its output, so deduplication saves no traffic and
    the barrier only breaks fusion). Kept as a utility for genuinely
    expensive cotangent producers; not used by the production models.
    """
    return x


def _barrier_fwd(x):
    return x, None


def _barrier_bwd(_, g):
    return (jax.lax.optimization_barrier(g),)


barrier_cotangent.defvjp(_barrier_fwd, _barrier_bwd)


@jax.custom_vjp
def bias_add(y: jax.Array, b: jax.Array) -> jax.Array:
    """y + b with the b-cotangent computed as an MXU ones-dot.

    Takes `b` in its PARAM dtype (the compute-dtype cast happens inside) so
    the backward's fp32 dot accumulation reaches the parameter without a
    round-trip through bf16.
    """
    return y + b.astype(y.dtype)


def _bias_add_fwd(y, b):
    # residual: a zero-strength reference to b, kept only for its dtype
    # (custom_vjp residuals must be JAX values, not dtypes)
    return y + b.astype(y.dtype), jnp.zeros((), b.dtype)


def _bias_add_bwd(b_proto, g):
    g2 = g.reshape(-1, g.shape[-1])
    ones = jnp.ones((1, g2.shape[0]), g2.dtype)
    db = jnp.dot(ones, g2, preferred_element_type=jnp.float32)[0]
    return g, db.astype(b_proto.dtype)


bias_add.defvjp(_bias_add_fwd, _bias_add_bwd)


class MxuDense(nn.Module):
    """`nn.Dense` with the bias gradient contracted on the MXU."""

    features: int
    use_bias: bool = True
    dtype: Dtype | None = None
    param_dtype: Dtype = jnp.float32
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel", self.kernel_init, (x.shape[-1], self.features),
            self.param_dtype,
        )
        bias = (
            self.param("bias", self.bias_init, (self.features,), self.param_dtype)
            if self.use_bias
            else None
        )
        x, kernel = promote_dtype(x, kernel, dtype=self.dtype)
        y = jax.lax.dot_general(
            x, kernel, (((x.ndim - 1,), (0,)), ((), ()))
        )
        if bias is not None:
            y = bias_add(y, bias)  # cast to y.dtype happens inside
        return y
