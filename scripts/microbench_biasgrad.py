"""A/B the bias-gradient reduction patterns at headline shapes.

The round-3 headline profile shows ~29 ms/step of convert_reduce /
multiply_reduce fusions (bias + LN-scale gradients: sum a (B, N, C) bf16
tensor over (B, N) into fp32 (C,)) running at 14-80 GB/s — far below the
~820 GB/s HBM roofline. Candidate: route the same contraction through the
MXU as a (1, M) × (M, C) dot.

Each variant loops `INNER` times inside one jit (inputs perturbed by an
iteration-dependent scalar so XLA cannot CSE) — the tunnel's ~0.6 ms
dispatch floor would otherwise swamp sub-ms ops.

Usage: python scripts/microbench_biasgrad.py   (on the real chip)
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp

INNER = 32


def timeit(fn, *args, iters=8):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.asarray(out).ravel()[0].astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.asarray(out).ravel()[0].astype(jnp.float32))
    return (time.perf_counter() - t0) / (iters * INNER) * 1e3


def inner_loop(body, g):
    def step(i, acc):
        return acc + body(g + i.astype(g.dtype))

    return jax.lax.fori_loop(0, INNER, step, body(g))


def main() -> None:
    key = jax.random.PRNGKey(0)
    for shape in [(32, 237, 3072), (32, 237, 768), (128, 237, 768)]:
        g = jax.random.normal(key, shape, jnp.bfloat16)
        gbytes = g.size * 2 / 1e9

        @jax.jit
        def red(g):
            return inner_loop(
                lambda t: jnp.sum(t.astype(jnp.float32), axis=(0, 1)), g
            )

        @jax.jit
        def dot1(g):
            def body(t):
                t2 = t.reshape(-1, t.shape[-1])
                ones = jnp.ones((1, t2.shape[0]), t.dtype)
                return jnp.dot(ones, t2, preferred_element_type=jnp.float32)[0]

            return inner_loop(body, g)

        t_red = timeit(red, g)
        t_dot1 = timeit(dot1, g)
        print(
            f"{str(shape):>16s} ({gbytes*1e3:6.1f} MB): "
            f"reduce {t_red:6.3f} ms ({gbytes/t_red*1e3:5.0f} GB/s)  "
            f"dot1 {t_dot1:6.3f} ms ({gbytes/t_dot1*1e3:5.0f} GB/s)"
        )


if __name__ == "__main__":
    main()
