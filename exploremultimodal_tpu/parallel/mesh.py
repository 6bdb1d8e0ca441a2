"""Device mesh construction + multi-host runtime init.

TPU-native replacement of the reference's NCCL process-group bootstrap
(utils/utils.py:298-334 `init_distributed_mode`): instead of one process per
GPU rendezvousing over env://, JAX is single-controller per host and
parallelism is expressed as sharding over a `Mesh` with named axes:

  data    batch parallelism (grad psum rides ICI)
  fsdp    parameter/optimizer-state sharding (ZeRO-3 analogue)
  tensor  tensor parallelism (FFN hidden / attention heads)

All presets (configs/parallel/*.yaml) use the same mesh; they differ only in
which axes have size > 1 and in the param partition rules.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"
TENSOR_AXIS = "tensor"
MESH_AXES = (DATA_AXIS, FSDP_AXIS, TENSOR_AXIS)


_runtime_initialized = False


def initialize_runtime(cfg: Any) -> None:
    """PRNG impl + multi-host init (idempotent; no-op single process).

    Reference parity: init_distributed_mode reads torchrun/SLURM env; here a
    coordinator address + process count drive jax.distributed.initialize.
    Called from main() and defensively from Trainer.__init__ (library use).
    """
    global _runtime_initialized
    rt = cfg.get("runtime", {})
    impl = rt.get("prng_impl")
    if impl:
        jax.config.update("jax_default_prng_impl", impl)
    # Global host-RNG seeding, per process AND per call (reference
    # main.py:88-92: seed = cfg.seed + rank → torch/np/random). JAX device
    # RNG is keyed explicitly everywhere, but the HOST data path is not:
    # the HF MLM collators (DataCollatorForWholeWordMask) draw from the
    # global numpy/python RNG, so without this the masking stream depends
    # on whatever ran earlier in the process. Not gated behind the
    # idempotence flag: every Trainer construction restarts the stream.
    import random as _py_random

    seed = int(cfg.get("seed", 0)) + jax.process_index()
    _py_random.seed(seed)
    np.random.seed(seed % (2 ** 32))
    if _runtime_initialized:
        return
    if rt.get("coordinator_address"):
        # mark initialized only on success: if the coordinator is transiently
        # unavailable a retry must attempt distributed init again instead of
        # silently proceeding single-process
        jax.distributed.initialize(
            coordinator_address=rt["coordinator_address"],
            num_processes=rt.get("num_processes"),
            process_id=rt.get("process_id"),
        )
    _runtime_initialized = True


def _reconcile_with_preset(cfg: Any, data: int, fsdp: int, tensor: int):
    """Derive mesh axis sizes from the parallel preset's flags.

    Selecting `parallel=fsdp` (etc.) must actually shard: when the preset
    requests param/opt-state/tensor sharding but the user left the matching
    mesh axis at its default of 1 (with `data: -1` absorbing everything), the
    sharding axis takes all devices instead. Explicit runtime.mesh overrides
    always win; a pinned axis of 1 combined with a sharding flag draws a
    warning rather than silently degenerating to pure DP (round-1 advisor
    finding). Batches shard over ('data','fsdp') jointly (pipeline.py), so
    fsdp=-1/data=1 is standard ZeRO: full data parallelism + state sharding
    over the same devices.
    """
    par = cfg.get("parallel", {}) or {}
    wants_fsdp_axis = bool(par.get("shard_params") or par.get("shard_opt_state"))
    wants_tensor_axis = bool(par.get("tensor_parallel"))

    if wants_tensor_axis and tensor == 1:
        if data == -1 and fsdp == 1:
            tensor, data = -1, 1
        else:
            import logging

            logging.getLogger(__name__).warning(
                "parallel preset requests tensor parallelism but "
                "runtime.mesh.tensor=1 — nothing will be tensor-sharded"
            )
    elif wants_fsdp_axis and fsdp == 1:
        if data == -1:
            fsdp, data = -1, 1
        else:
            import logging

            logging.getLogger(__name__).warning(
                "parallel preset requests param/opt-state sharding but "
                "runtime.mesh.fsdp=1 — nothing will be sharded"
            )
    return data, fsdp, tensor


def create_mesh(
    cfg: Any = None,
    *,
    devices: list | None = None,
    data: int = -1,
    fsdp: int = 1,
    tensor: int = 1,
) -> Mesh:
    """Build the (data, fsdp, tensor) mesh over all devices.

    Axis sizes come from cfg.runtime.mesh when a config is given; an axis size
    of -1 absorbs all remaining devices. Axis order puts `tensor` innermost so
    tensor-parallel collectives ride the fastest ICI links.
    """
    if cfg is not None:
        mesh_cfg = cfg.select("runtime.mesh", {}) or {}
        data = mesh_cfg.get(DATA_AXIS, data)
        fsdp = mesh_cfg.get(FSDP_AXIS, fsdp)
        tensor = mesh_cfg.get(TENSOR_AXIS, tensor)
        data, fsdp, tensor = _reconcile_with_preset(cfg, data, fsdp, tensor)

    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    sizes = {DATA_AXIS: data, FSDP_AXIS: fsdp, TENSOR_AXIS: tensor}
    fixed = math.prod(s for s in sizes.values() if s != -1)
    free_axes = [a for a, s in sizes.items() if s == -1]
    if len(free_axes) > 1:
        raise ValueError(f"at most one mesh axis may be -1, got {sizes}")
    if free_axes:
        if n % fixed != 0:
            raise ValueError(f"{n} devices not divisible by fixed axes {sizes}")
        sizes[free_axes[0]] = n // fixed
    if math.prod(sizes.values()) != n:
        raise ValueError(f"mesh {sizes} does not cover {n} devices")

    shape = tuple(sizes[a] for a in MESH_AXES)
    return Mesh(np.asarray(devices).reshape(shape), MESH_AXES)
