"""Input pipeline: threaded loading, deterministic sharding, device feed.

TPU-native replacement of the reference's DataLoader stack:
  - DistributedSampler → deterministic per-epoch permutation sliced per
    process (multitask_datamodule.py:54-78)
  - torch DataLoader workers → a thread pool decoding/augmenting samples
    (PIL/cv2 release the GIL on the hot paths)
  - DataLoaderX background CUDA-stream H2D staging (bg_dataloader.py:85-132)
    → a prefetch queue of ready numpy batches + `jax.device_put` onto the
    mesh's `data`-axis sharding one batch ahead (double buffering)

Batches carry uint8 image crops; normalization fuses into the jitted step
(ops/preprocess.py).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Iterator

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Sample = dict[str, Any]


def collate(samples: list[Sample]) -> dict[str, np.ndarray]:
    """Stack sample dicts; non-array fields become object lists."""
    out: dict[str, Any] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        first = vals[0]
        if isinstance(first, np.ndarray) or isinstance(
            first, (int, float, bool, np.integer, np.floating, np.bool_)
        ):
            out[key] = np.stack([np.asarray(v) for v in vals])
        else:
            out[key] = vals  # e.g. table_name strings
        del vals
    return out


class ShardedLoader:
    """Epoch-based loader over a map-style dataset.

    Deterministic shuffling from (seed, epoch); each JAX process reads its
    own contiguous-stride slice (DistributedSampler parity: shuffle train
    only, drop_last for even shards).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        shuffle: bool = True,
        seed: int = 0,
        num_workers: int = 8,
        drop_last: bool = True,
        prefetch: int = 4,
        process_index: int | None = None,
        process_count: int | None = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(num_workers, 1)
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.epoch = 0
        self.process_index = (
            process_index if process_index is not None else jax.process_index()
        )
        self.process_count = (
            process_count if process_count is not None else jax.process_count()
        )

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch
        # per-epoch augmentation seeds (map-style datasets read .epoch)
        stack = [self.dataset]
        while stack:
            ds = stack.pop()
            if hasattr(ds, "datasets"):
                stack.extend(ds.datasets)
            elif hasattr(ds, "epoch"):
                ds.epoch = epoch

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            order = np.random.default_rng((self.seed, self.epoch)).permutation(n)
        else:
            order = np.arange(n)
        # pad to a multiple of (process_count · batch) like DistributedSampler
        world_batch = self.batch_size * self.process_count
        if self.drop_last:
            order = order[: (n // world_batch) * world_batch]
        else:
            pad = (-len(order)) % world_batch
            if pad:
                order = np.concatenate([order, order[:pad]])
        return order[self.process_index :: self.process_count]

    def __len__(self) -> int:
        return len(self._indices()) // self.batch_size

    def __iter__(self) -> Iterator[dict[str, np.ndarray]]:
        indices = self._indices()
        n_batches = len(indices) // self.batch_size
        if n_batches == 0:
            return

        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce() -> None:
            with ThreadPoolExecutor(self.num_workers) as pool:
                for b in range(n_batches):
                    if stop.is_set():
                        break
                    batch_idx = indices[b * self.batch_size : (b + 1) * self.batch_size]
                    samples = list(pool.map(self.dataset.__getitem__, batch_idx))
                    out_q.put(collate(samples))
            out_q.put(None)

        producer = threading.Thread(target=produce, daemon=True)
        producer.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    break
                yield batch
        finally:
            stop.set()
            # drain so the producer can exit
            while producer.is_alive():
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    producer.join(timeout=0.1)


class DeviceFeeder:
    """Double-buffered host→device staging (DataLoaderX parity,
    bg_dataloader.py:101-121): batch k+1 transfers while batch k computes.

    Batches shard over the ('data','fsdp') axes jointly — under FSDP presets
    the fsdp axis also carries data parallelism (standard ZeRO semantics), so
    no device computes a redundant batch slice. With multiple JAX processes,
    each host's local slice is assembled into the global batch via
    jax.make_array_from_process_local_data (a plain device_put would treat
    the local slice as the GLOBAL value — round-1 advisor finding)."""

    def __init__(self, mesh: Mesh | None = None,
                 batch_axes: tuple[str, ...] = ("data", "fsdp")):
        self.mesh = mesh
        self.batch_axes = (
            tuple(a for a in batch_axes if mesh is None or a in mesh.shape)
            or ("data",)
        )

    def _sharding(self, v) -> NamedSharding:
        shard_size = int(
            np.prod([self.mesh.shape[a] for a in self.batch_axes])
        )
        # batches not divisible by the batch axes (small eval tails, 0-d
        # scalars) replicate instead of sharding
        if v.ndim >= 1:
            global_rows = v.shape[0] * max(jax.process_count(), 1)
            if global_rows % shard_size == 0:
                return NamedSharding(
                    self.mesh, P(self.batch_axes, *([None] * (v.ndim - 1)))
                )
        return NamedSharding(self.mesh, P())

    def _put(self, batch: dict) -> dict:
        arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
        rest = {k: v for k, v in batch.items() if not isinstance(v, np.ndarray)}
        if self.mesh is None:
            staged = jax.device_put(arrays)
        elif jax.process_count() > 1:
            staged = {}
            for k, v in arrays.items():
                sharding = self._sharding(v)
                if sharding.spec == P():
                    # replicated fallback (ragged eval tail): every process
                    # holds a DIFFERENT local slice, so the global value must
                    # be assembled host-side first — handing local data to
                    # make_array_from_process_local_data with a replicated
                    # spec would give devices on different hosts different
                    # contents for the "same" array (round-2 review finding).
                    # 0-d scalars are host-uniform (collated constants) and
                    # stage as-is.
                    if v.ndim >= 1:
                        from jax.experimental import multihost_utils

                        g = np.asarray(multihost_utils.process_allgather(v))
                        # merge the (process, local rows) leading axes
                        v = g.reshape((-1,) + g.shape[2:])
                    staged[k] = jax.device_put(v, sharding)
                else:
                    staged[k] = jax.make_array_from_process_local_data(
                        sharding, v
                    )
        else:
            staged = {
                k: jax.device_put(v, self._sharding(v))
                for k, v in arrays.items()
            }
        staged.update(rest)
        return staged

    def __call__(self, host_iter) -> Iterator[dict]:
        pending = None
        for batch in host_iter:
            staged = self._put(batch)
            if pending is not None:
                yield pending
            pending = staged
        if pending is not None:
            yield pending
