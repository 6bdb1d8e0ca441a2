"""On-chip micro-benchmark: attention implementations at VLMo shapes.

Compares fwd and fwd+bwd wall time of the three `multi_head_attention`
implementations ('xla', 'recompute', 'pallas') at the shapes the pretrain
step actually runs (see BENCH.md). Timings use a device→host scalar readback
fence (block_until_ready does not fence the tunneled axon backend).

Usage:  python scripts/microbench_attention.py [iters]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from exploremultimodal_tpu.ops import multi_head_attention
from exploremultimodal_tpu.ops.attention import key_padding_bias


def _sync(x) -> None:
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0])).ravel()[:1]


def timeit(fn, iters: int) -> float:
    out = None
    for _ in range(3):
        out = fn()
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1000  # ms


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    dtype = jnp.bfloat16
    shapes = [
        # (B, H, N, D) — VLMo-Base streams at batch 32 / ITM 3·bs / batch 64
        (32, 12, 237, 64),
        (96, 12, 237, 64),
        (64, 12, 237, 64),
        (192, 12, 237, 64),
        (32, 12, 512, 64),
    ]
    rng = np.random.default_rng(0)
    for B, H, N, D in shapes:
        q, k, v = (
            jnp.asarray(rng.normal(size=(B, H, N, D)), dtype) for _ in range(3)
        )
        mask = np.ones((B, N), np.int32)
        mask[:, N - 17:] = 0
        bias = key_padding_bias(jnp.asarray(mask))
        row = {"shape": f"B{B} H{H} N{N} D{D}"}
        for impl in ("xla", "recompute", "pallas"):
            fwd = jax.jit(
                lambda q, k, v, impl=impl: multi_head_attention(
                    q, k, v, bias=bias, impl=impl
                )
            )

            def loss(q, k, v, impl=impl):
                out = multi_head_attention(q, k, v, bias=bias, impl=impl)
                return jnp.sum(out.astype(jnp.float32) ** 2)

            step = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
            row[f"{impl}_fwd_ms"] = round(timeit(lambda: fwd(q, k, v), iters), 3)
            row[f"{impl}_fbwd_ms"] = round(timeit(lambda: step(q, k, v), iters), 3)
        print(row, flush=True)


if __name__ == "__main__":
    main()
