"""Does the v5e MXU give int8 dots ~2x bf16 throughput via XLA?

Chains K dots inside one jitted fori_loop with a data dependency (the
round-2 methodology — defeats the tunnel's ~25-30 ms dispatch floor) and
compares bf16 x bf16 -> bf16 against int8 x int8 -> int32 at square sizes.
v5e datasheet: 197 TFLOP/s bf16, 394 TOPS int8. If XLA routes int8 dots
onto the MXU at rate, a W8A8 quantized forward is the only remaining
per-chip lever past the bf16 matmul roofline (BENCH.md round 3).

Usage: python scripts/microbench_int8.py [size ...]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

K = 16


@functools.partial(jax.jit, static_argnums=(1,))
def chain_bf16(x, n):
    def body(_, acc):
        return lax.dot(acc, acc, precision=lax.Precision.DEFAULT)

    return lax.fori_loop(0, n, body, x)


@functools.partial(jax.jit, static_argnums=(2,))
def chain_int8(x, w, n):
    def body(_, carry):
        acc, w = carry
        y = lax.dot_general(
            acc,
            w,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        # re-narrow so the next iteration is again an int8 x int8 dot
        return (y >> jnp.int32(8)).astype(jnp.int8), w

    return lax.fori_loop(0, n, body, (x, w))[0]


def run(n: int) -> None:
    kx = jax.random.key(0)
    xb = jax.random.normal(kx, (n, n), jnp.bfloat16) * 0.01
    xi = jax.random.randint(kx, (n, n), -127, 127, jnp.int8)
    wi = jax.random.randint(jax.random.key(1), (n, n), -127, 127, jnp.int8)

    flops = 2.0 * n * n * n * K

    y = chain_bf16(xb, K)
    float(y.astype(jnp.float32).sum())  # warm + sync
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        y = chain_bf16(xb, K)
    float(y.astype(jnp.float32).sum())
    dt_b = (time.perf_counter() - t0) / reps

    y = chain_int8(xi, wi, K)
    float(y.astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(reps):
        y = chain_int8(xi, wi, K)
    float(y.astype(jnp.float32).sum())
    dt_i = (time.perf_counter() - t0) / reps

    print(
        f"n={n}: bf16 {dt_b*1e3/K:7.2f} ms/dot ({flops/dt_b/1e12:6.1f} TFLOP/s)"
        f" | int8 {dt_i*1e3/K:7.2f} ms/dot ({flops/dt_i/1e12:6.1f} TOP/s)"
        f" | speedup {dt_b/dt_i:.2f}x"
    )


if __name__ == "__main__":
    sizes = [int(s) for s in sys.argv[1:]] or [2048, 4096, 8192]
    print("devices:", jax.devices())
    for s in sizes:
        run(s)
