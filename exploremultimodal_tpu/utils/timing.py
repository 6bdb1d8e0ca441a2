"""Single timing methodology for every benchmark in this repo.

On the tunneled TPU backend (axon) `block_until_ready` returns before remote
execution finishes — a 1-matmul "benchmark" reads 35,000 TFLOP/s (BENCH.md
round-1 methodology note). The only reliable fence is a scalar device→host
readback. All harnesses (bench.py, scripts/bench_serving_latency.py,
trainer throughput_mode) share THIS implementation so their numbers are
comparable by construction; the reference's equivalent is the paired
CUDA-event timer in /root/reference/train/pretrain/multimodal.py:458-482.
"""

from __future__ import annotations

import time
from typing import Callable


def sync(out) -> None:
    """Force completion via a host readback of one output leaf."""
    import jax
    import numpy as np

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf)).ravel()[:1]


def timeit(step: Callable[[], object], n_warmup: int, n_iters: int) -> float:
    """Mean seconds/iteration: warmup → fence → timed loop → fence.

    `step` must return (something containing) a device array whose value
    depends on the work being timed, so the final readback fences it.
    """
    out = None
    for _ in range(n_warmup):
        out = step()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = step()
    sync(out)
    return (time.perf_counter() - t0) / n_iters
