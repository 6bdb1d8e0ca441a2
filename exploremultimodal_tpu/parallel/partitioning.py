"""Parameter partition rules for the parallelism presets.

TPU-native replacement of DeepSpeed's ZeRO stages (conf/ds_stage/*.yaml):
instead of an engine that shards tensors at runtime, each preset is a pure
function param-path → PartitionSpec; GSPMD inserts the all-gathers /
reduce-scatters implied by the shardings.

  dp     everything replicated; batch on `data` (ZeRO-0 / plain DDP)
  zero1  params replicated; ADAM moments sharded over `fsdp` (ZeRO-1)
  fsdp   params + moments sharded over `fsdp` (ZeRO-3 / FSDP)
  tp     fsdp + tensor-parallel FFN/attention over `tensor`

Sharding picks, per tensor, the largest axis divisible by the mesh-axis size
(≥ min_size elements total, else replicate — small tensors aren't worth the
collective).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from exploremultimodal_tpu.parallel.mesh import DATA_AXIS, FSDP_AXIS, TENSOR_AXIS

MIN_SHARD_SIZE = 2**14  # replicate tensors smaller than 16K elements


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", p)) for p in path)


def _shard_largest_axis(shape: tuple[int, ...], axis_size: int,
                        axis_name: str) -> P:
    if int(np.prod(shape)) < MIN_SHARD_SIZE or axis_size <= 1:
        return P()
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for i in order:
        if shape[i] % axis_size == 0:
            spec: list = [None] * len(shape)
            spec[i] = axis_name
            return P(*spec)
    return P()


def _tp_spec(name: str, shape: tuple[int, ...]) -> P | None:
    """Megatron-style FFN/attention split over the `tensor` axis."""
    if "fc1" in name and name.endswith("kernel"):
        return P(None, TENSOR_AXIS)  # column parallel
    if "fc2" in name and name.endswith("kernel"):
        return P(TENSOR_AXIS, None)  # row parallel
    if "qkv" in name and name.endswith("kernel"):
        return P(None, TENSOR_AXIS)
    if "attn/proj" in name and name.endswith("kernel"):
        return P(TENSOR_AXIS, None)
    return None


def param_specs(params: Any, preset: str, mesh: Mesh) -> Any:
    """PartitionSpec tree for the parameters under `preset`."""
    fsdp_size = mesh.shape[FSDP_AXIS]
    tensor_size = mesh.shape[TENSOR_AXIS]

    def spec(path, leaf) -> P:
        name = _path_str(path)
        shape = tuple(leaf.shape)
        if preset == "tp" and tensor_size > 1:
            tp = _tp_spec(name, shape)
            if tp is not None:
                return tp
        if preset in ("fsdp", "tp") and fsdp_size > 1:
            return _shard_largest_axis(shape, fsdp_size, FSDP_AXIS)
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def opt_state_specs(opt_state: Any, preset: str, mesh: Mesh) -> Any:
    """PartitionSpec tree for optimizer state.

    The shard choice is purely shape-derived (largest divisible axis), so
    ADAM moments land on the same spec as their parameter under fsdp/tp, and
    zero1 shards the moments of replicated params — exactly ZeRO-1. Scalars
    (schedule counts) replicate.
    """
    fsdp_size = mesh.shape[FSDP_AXIS]
    shard_state = preset in ("zero1", "fsdp", "tp") and fsdp_size > 1

    def state_spec(leaf) -> P:
        if not hasattr(leaf, "shape") or getattr(leaf, "ndim", 0) == 0:
            return P()
        if shard_state:
            return _shard_largest_axis(tuple(leaf.shape), fsdp_size, FSDP_AXIS)
        return P()

    return jax.tree_util.tree_map(state_spec, opt_state)


def to_shardings(spec_tree: Any, mesh: Mesh) -> Any:
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s),
        spec_tree,
        is_leaf=lambda x: isinstance(x, P),
    )


def batch_specs(batch: Any) -> Any:
    """Shard every batch array on its leading (batch) dim over the joint
    ('data','fsdp') axes — the fsdp axis carries data parallelism too
    (standard ZeRO: state sharded over the same devices that split the
    batch)."""
    return jax.tree_util.tree_map(
        lambda v: P((DATA_AXIS, FSDP_AXIS), *([None] * (v.ndim - 1))), batch
    )
