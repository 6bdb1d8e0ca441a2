"""Training metric meters.

Reference parity: utils/utils.py:19-169 — `SmoothedValue` (windowed deque +
global sum/count with cross-rank sync) and `MetricLogger` (dict of meters,
`log_every` generator wrapping the data iterator with iter/data timing and
ETA). Cross-process sync uses a jitted psum over all devices instead of a
NCCL all_reduce.
"""

from __future__ import annotations

import datetime
import time
from collections import defaultdict, deque
from typing import Iterable, Iterator

import jax
import jax.numpy as jnp
import numpy as np


def _global_sum(values: np.ndarray) -> np.ndarray:
    """Sum a small host array across all JAX processes.

    Single-process (incl. one process driving many devices): identity.
    Multi-process: all-reduce via multihost_utils.
    """
    if jax.process_count() == 1:
        return values
    from jax.experimental import multihost_utils

    return np.asarray(
        multihost_utils.process_allgather(jnp.asarray(values)).sum(axis=0)
    )


class SmoothedValue:
    """Tracks a windowed median/average plus a global (syncable) average.

    Device arrays are held lazily and materialized only when a statistic is
    read (logging cadence) — a per-step float() would force a host-device
    sync every iteration and break JAX async dispatch.
    """

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque: deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self._pending: list[tuple[object, int]] = []
        self.fmt = fmt

    def update(self, value, n: int = 1) -> None:
        self.deque.append(value)
        self._pending.append((value, n))

    def _flush(self) -> None:
        for value, n in self._pending:
            self.count += n
            self.total += float(np.asarray(value)) * n
        self._pending.clear()

    def _window(self) -> list[float]:
        return [float(np.asarray(v)) for v in self.deque]

    def synchronize_between_processes(self) -> None:
        self._flush()
        summed = _global_sum(np.array([self.count, self.total], dtype=np.float64))
        self.count = int(summed[0])
        self.total = float(summed[1])

    @property
    def median(self) -> float:
        return float(np.median(self._window())) if self.deque else 0.0

    @property
    def avg(self) -> float:
        return float(np.mean(self._window())) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        self._flush()
        return self.total / max(self.count, 1)

    @property
    def max(self) -> float:
        return max(self._window()) if self.deque else 0.0

    @property
    def value(self) -> float:
        return float(np.asarray(self.deque[-1])) if self.deque else 0.0

    def __str__(self) -> str:
        return self.fmt.format(
            median=self.median,
            avg=self.avg,
            global_avg=self.global_avg,
            max=self.max,
            value=self.value,
        )


class MetricLogger:
    def __init__(self, delimiter: str = "  ", logger=None):
        self.meters: dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter
        self.logger = logger

    def update(self, n: int = 1, **kwargs) -> None:
        for k, v in kwargs.items():
            if v is None:
                continue
            # device arrays stay lazy (SmoothedValue materializes at read)
            self.meters[k].update(v, n=n)

    def __getattr__(self, attr: str) -> SmoothedValue:
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(attr)

    def __str__(self) -> str:
        return self.delimiter.join(f"{k}: {m}" for k, m in self.meters.items())

    def synchronize_between_processes(self) -> None:
        for meter in self.meters.values():
            meter.synchronize_between_processes()

    def add_meter(self, name: str, meter: SmoothedValue) -> None:
        self.meters[name] = meter

    def log_every(
        self, iterable: Iterable, print_freq: int, header: str = ""
    ) -> Iterator:
        i = 0
        try:
            total = len(iterable)  # type: ignore[arg-type]
        except TypeError:
            total = None
        start_time = time.time()
        end = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")

        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0 and self.logger is not None:
                if total:
                    eta = iter_time.global_avg * (total - i)
                    eta_str = str(datetime.timedelta(seconds=int(eta)))
                    pos = f"[{i}/{total}] eta: {eta_str}"
                else:
                    pos = f"[{i}]"
                self.logger.info(
                    self.delimiter.join(
                        [
                            header,
                            pos,
                            str(self),
                            f"time: {iter_time}",
                            f"data: {data_time}",
                        ]
                    )
                )
            i += 1
            end = time.time()

        elapsed = time.time() - start_time
        if self.logger is not None:
            per_it = elapsed / max(i, 1)
            self.logger.info(
                f"{header} Total time: "
                f"{datetime.timedelta(seconds=int(elapsed))} ({per_it:.4f} s / it)"
            )
