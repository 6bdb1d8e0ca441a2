"""On-chip micro-benchmark: attention implementations at VLMo shapes.

Compares fwd and fwd+bwd wall time of the three `multi_head_attention`
implementations ('xla', 'recompute', 'pallas') at the shapes the pretrain
step actually runs (see BENCH.md).

Methodology: K iterations are chained INSIDE one jitted fori_loop with a
genuine data dependency (q perturbed by the running loss), so per-dispatch
tunnel latency (~25-30 ms on the axon backend) and host sync cost are
amortized to nothing. A plain per-call loop measures mostly dispatch at
these op sizes — round-1 numbers measured that way are not comparable.

Usage:  python scripts/microbench_attention.py [iters]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from exploremultimodal_tpu.ops import multi_head_attention  # noqa: E402
from exploremultimodal_tpu.ops.attention import key_padding_bias  # noqa: E402

K = 20  # chained iterations per measurement


def _sync(x) -> None:
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0])).ravel()[:1]


def chain_time(op, q, k, v, iters: int) -> float:
    """ms per op: K on-device chained calls, `iters` outer reps."""

    @jax.jit
    def many(q, k, v):
        def body(i, carry):
            s, q = carry
            out = op(q + s * 1e-20, k, v)
            s = s + jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).sum() * 1e-30
            return s, q
        s, _ = jax.lax.fori_loop(0, K, body, (jnp.float32(0), q))
        return s

    out = many(q, k, v)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = many(q, k, v)
    _sync(out)
    return (time.perf_counter() - t0) / iters / K * 1000


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    dtype = jnp.bfloat16
    shapes = [
        # (B, H, N, D) — VLMo-Base streams at batch 32 / ITM 3·bs / batch 64
        (32, 12, 237, 64),
        (96, 12, 237, 64),
        (64, 12, 237, 64),
        (192, 12, 237, 64),
        (32, 12, 512, 64),
        (8, 12, 2048, 64),
        # bert_mlm serving config (VERDICT r4 ask 3) + its hypothetical
        # "2-heads-packed" twin: (256, 6, 196, 128) runs the SAME MAC count
        # with the MXU contraction full — the gap between these two rows is
        # the ceiling any head-packing scheme could ever recover (the
        # block-diagonal packing that actual per-head scores would need
        # costs 2× the MACs, so it pays only if the gap exceeds 2×)
        (256, 12, 196, 64),
        (256, 6, 196, 128),
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
            def fwd_op(q, k, v, impl=impl):
                return multi_head_attention(q, k, v, bias=bias, impl=impl)

            def grad_op(q, k, v, impl=impl):
                def loss(q):
                    out = multi_head_attention(q, k, v, bias=bias, impl=impl)
                    return jnp.sum(out.astype(jnp.float32) ** 2)

                return jax.grad(loss)(q)

            row[f"{impl}_fwd_ms"] = round(chain_time(fwd_op, q, k, v, iters), 3)
            row[f"{impl}_fbwd_ms"] = round(chain_time(grad_op, q, k, v, iters), 3)
        print(row, flush=True)


if __name__ == "__main__":
    main()
