"""Child process for the 2-process DeviceFeeder staging test
(tests/test_multiprocess_staging.py). Each process owns 2 fake CPU devices;
the global mesh is data=4. Verifies jax.make_array_from_process_local_data
assembles per-process local slices into the correct global batch, and that
the ragged/replicated fallback allgathers host-side first
(data/pipeline.py:182-209)."""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

coordinator, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(
    coordinator_address=coordinator, num_processes=2, process_id=pid
)

import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from exploremultimodal_tpu.data.pipeline import DeviceFeeder  # noqa: E402

assert jax.process_count() == 2, jax.process_count()
assert len(jax.local_devices()) == 2, jax.local_devices()
assert len(jax.devices()) == 4, jax.devices()

mesh = Mesh(np.asarray(jax.devices()).reshape(4), ("data",))
feeder = DeviceFeeder(mesh, batch_axes=("data",))

# local slice: process p holds global rows [4p, 4p+4) — row r carries value r
local = {
    "x": np.arange(4 * pid, 4 * pid + 4, dtype=np.float32)[:, None]
    * np.ones((4, 3), np.float32),
    # ragged leading dim (5 rows globally→10, not divisible pattern kept
    # simple: 5 local rows → 10 global rows % 4 != 0 → replicated fallback)
    "tail": np.full((5, 2), float(pid), np.float32),
    # 0-d host-uniform scalar
    "flag": np.float32(7.0),
}
staged = feeder._put(dict(local))

from jax.experimental import multihost_utils  # noqa: E402

# sharded path: the global array must be rows 0..7 in process order
x = staged["x"]
assert x.shape == (8, 3), x.shape
got = np.asarray(
    multihost_utils.process_allgather(
        jax.jit(lambda a: a.sum(axis=1))(x), tiled=True
    )
)
want = np.arange(8, dtype=np.float32) * 3
np.testing.assert_allclose(got[:8], want)

# replicated fallback: both processes' tails concatenated host-side, same
# global value everywhere — a fully-replicated output IS addressable locally
tail = staged["tail"]
assert tail.shape == (10, 2), tail.shape
tail_np = np.asarray(tail.addressable_shards[0].data)
np.testing.assert_allclose(
    tail_np, np.concatenate([np.zeros((5, 2)), np.ones((5, 2))])
)

assert float(staged["flag"]) == 7.0

print(f"child {pid} OK", flush=True)
