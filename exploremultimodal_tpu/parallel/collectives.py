"""Cross-device collectives for the contrastive objectives.

Reference parity: models/vlmo/objectives.py:392-435 —

  GatherLayer        forward = all_gather + concat over the data axis;
                     backward = all_reduce(SUM) of the full gradient, then
                     slice out this shard's rows (identical math to a
                     reduce-scatter of the gathered gradient).
  torch.roll trick   objectives.py:104-105 rolls the gathered features by
                     -bs*rank so each shard's positives sit on the local
                     diagonal and ITC labels stay arange(bs).
  concat_all_gather  gradient-free gather for negative-queue updates.

These run inside shard_map over the `data` mesh axis. With axis_name=None
(single device / no sharding) they degrade to identity, so objective code is
written once.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _gather(x: jax.Array, axis_name: str) -> jax.Array:
    return jax.lax.all_gather(x, axis_name, tiled=True)


def _gather_fwd(x, axis_name):
    return _gather(x, axis_name), x.shape[0]


def _gather_bwd(axis_name, local_rows, g):
    # all-reduce the gathered gradient, then take this shard's rows — the
    # GatherLayer backward (objectives.py:416-426). Equivalent to
    # psum_scatter but written to mirror the reference semantics exactly.
    summed = jax.lax.psum(g, axis_name)
    idx = jax.lax.axis_index(axis_name) * local_rows
    return (jax.lax.dynamic_slice_in_dim(summed, idx, local_rows, axis=0),)


_gather.defvjp(_gather_fwd, _gather_bwd)


def all_gather_with_grad(
    x: jax.Array, axis_name: str | None, roll_local_first: bool = True
) -> jax.Array:
    """Gradient-preserving all-gather along `axis_name`.

    With roll_local_first=True the result is rolled so this shard's rows come
    first (reference's torch.roll diagonal alignment) — positives for the
    local batch land on the diagonal of the similarity matrix.
    """
    if axis_name is None:
        return x
    gathered = _gather(x, axis_name)
    if roll_local_first:
        shift = -x.shape[0] * jax.lax.axis_index(axis_name)
        gathered = jnp.roll(gathered, shift, axis=0)
    return gathered


def concat_all_gather(x: jax.Array, axis_name: str | None) -> jax.Array:
    """Gradient-free gather (queue updates; objectives.py:429-435)."""
    if axis_name is None:
        return jax.lax.stop_gradient(x)
    return jax.lax.stop_gradient(jax.lax.all_gather(x, axis_name, tiled=True))
