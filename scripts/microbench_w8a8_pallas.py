"""A/B the Pallas fused W8A8 matmul vs XLA bf16 and XLA dynamic W8A8.

Shapes are the bert_mlm/VLMo dense shapes (M = batch*seq tokens). Chained
inside one jitted fori_loop with a data dependency (round-2 methodology —
defeats the tunnel's ~25-30 ms dispatch floor). Rates are reported as
effective TFLOP/s of the UNQUANTIZED matmul (2*M*K*N / t) so variants are
directly comparable.

Usage: python scripts/microbench_w8a8_pallas.py [M] [--bm 256] [--bn 512]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

from exploremultimodal_tpu.ops.quant import quant_dot
from exploremultimodal_tpu.ops.quant_pallas import (
    fused_w8a8_matmul,
    quantize_weights,
)

REPS = 5
CHAIN = 8


def timed(fn, x, flops_per_app: float) -> float:
    y = fn(x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(REPS):
        y = fn(x)
    jax.block_until_ready(y)
    dt = (time.perf_counter() - t0) / REPS / CHAIN
    return flops_per_app / dt / 1e12


def chain(step):
    @jax.jit
    def run(x):
        return lax.fori_loop(0, CHAIN, lambda _, a: step(a).astype(x.dtype), x)

    return run


def run_shapes(M: int, bm: int, bn: int) -> None:
    print(f"--- M={M} bm={bm} bn={bn}")
    for K, N in [(768, 768), (768, 3072), (3072, 768)]:
        kx, kw = jax.random.split(jax.random.key(0))
        x = jax.random.normal(kx, (M, K), jnp.bfloat16)
        w = jax.random.normal(kw, (K, N), jnp.float32) * 0.02
        wb = w.astype(jnp.bfloat16)
        qw, sw = quantize_weights(w)
        flops = 2.0 * M * K * N

        # square chains feed y back; rectangular chains bounce through a
        # second dense back to K so every iteration still runs the shape
        if K == N:
            back_b = back_q = back_p = lambda y: y
        else:
            w2 = jax.random.normal(jax.random.key(2), (N, K), jnp.float32) * 0.02
            w2b = w2.astype(jnp.bfloat16)
            qw2, sw2 = quantize_weights(w2)
            back_b = lambda y: y.astype(jnp.bfloat16) @ w2b
            back_q = lambda y: quant_dot(y.astype(jnp.bfloat16), w2)
            back_p = lambda y: fused_w8a8_matmul(
                y.astype(jnp.bfloat16), qw2, sw2, bm=bm, bn=bn
            )
            flops += 2.0 * M * N * K

        r_b = timed(chain(lambda a: back_b(a @ wb)), x, flops)
        r_q = timed(chain(lambda a: back_q(quant_dot(a, w))), x, flops)
        r_p = timed(
            chain(lambda a: back_p(fused_w8a8_matmul(a, qw, sw, bm=bm, bn=bn))),
            x,
            flops,
        )
        pair = "" if K == N else " (+ back-dense)"
        print(
            f"K={K} N={N}{pair}: bf16 {r_b:6.1f} | xla_w8a8 {r_q:6.1f} | "
            f"pallas_w8a8 {r_p:6.1f} eff-TFLOP/s | pallas/bf16 {r_p / r_b:.2f}x",
            flush=True,
        )


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    M = int(args[0]) if args else 50176  # 256 x 196 tokens
    print("devices:", jax.devices())
    if "--sweep" in sys.argv:
        for bm, bn in [(256, 384), (512, 384), (512, 256), (512, 768), (256, 768)]:
            try:
                run_shapes(M, bm, bn)
            except Exception as e:  # tunnel compile flakes shouldn't kill the sweep
                print(f"bm={bm} bn={bn} FAILED: {type(e).__name__}", flush=True)
    else:
        bm = int(sys.argv[sys.argv.index("--bm") + 1]) if "--bm" in sys.argv else 256
        bn = int(sys.argv[sys.argv.index("--bn") + 1]) if "--bn" in sys.argv else 512
        run_shapes(M, bm, bn)


if __name__ == "__main__":
    main()
