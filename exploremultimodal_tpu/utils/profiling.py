"""Profiling + failure-detection utilities.

Reference parity:
  - throughput_mode CUDA-event timing (multimodal.py:458-482) →
    Trainer.throughput with block_until_ready
  - per-iteration iter/data meters (utils.py:121-169) → MetricLogger
  - NaN dump: non-finite total loss logs + dumps the step outputs to
    <output_dir>/nan_dump_step{N}.npz and raises (multimodal.py:287-299)
  - no torch.profiler equivalent existed; here: jax.profiler trace capture
    around a step window (`profile_steps`), viewable in TensorBoard/XProf
"""

from __future__ import annotations

import contextlib
import os
from typing import Any, Iterator

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace for everything inside the context."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class NonFiniteLossError(RuntimeError):
    pass


def check_finite_and_dump(
    metrics: dict[str, Any],
    step: int,
    output_dir: str,
    logger=None,
) -> None:
    """Host-side non-finite guard (call sparsely — it syncs the device).

    Reference multimodal.py:281-299: per-loss isfinite filtering happens
    in-graph (models.task.total_loss); this guard catches a non-finite TOTAL,
    dumps the metrics, and aborts the run like the reference's sys.exit(1).
    """
    total = float(np.asarray(metrics.get("total_loss", 0.0)))
    if np.isfinite(total):
        return
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, f"nan_dump_step{step}.npz")
    np.savez(
        path,
        **{k: np.asarray(v) for k, v in metrics.items() if hasattr(v, "shape") or np.isscalar(v)},
    )
    if logger:
        logger.error(f"non-finite total loss at step {step}; dumped {path}")
    raise NonFiniteLossError(f"total loss non-finite at step {step} ({total})")
