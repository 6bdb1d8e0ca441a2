"""Functional train state.

Replaces the reference's mutable engine state (DDP module + optimizer +
GradScaler + EMA copies + registered queue buffers) with one pytree carried
through the jitted step:

  params / opt_state     model + ADAM moments
  ema_params             momentum encoder copy (vlmo_ema, vlmo_module.py:120-131)
  model_ema_params       separate checkpointed eval EMA (model_ema,
                         utils/utils.py:486-508 + conf/config.yaml:136-141) —
                         the reference holds BOTH trees when both flags are on
  img_queue / txt_queue  MoCo negative queues + ptr (vlmo_module.py:133-146)
  isda                   ISDA running class statistics (heads.py:6-51)
  rng                    step-folded PRNG key for dropout/droppath/sampling
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    rng: jax.Array
    ema_params: Any = None
    ema_decay: float = flax.struct.field(pytree_node=False, default=0.0)
    model_ema_params: Any = None
    model_ema_decay: float = flax.struct.field(pytree_node=False, default=0.0)
    img_queue: jax.Array | None = None
    txt_queue: jax.Array | None = None
    queue_ptr: jax.Array | None = None
    isda: Any = None

    def step_rngs(self, *names: str) -> dict[str, jax.Array]:
        base = jax.random.fold_in(self.rng, self.step)
        keys = jax.random.split(base, len(names))
        return dict(zip(names, keys))


def create_train_state(
    params: Any,
    opt: Any,
    rng: jax.Array,
    *,
    trainable: Any = None,
    use_ema: bool = False,
    ema_decay: float = 0.995,
    use_model_ema: bool = False,
    model_ema_decay: float = 0.9999,
    queue_size: int = 0,
    itc_dim: int = 256,
    isda_classes: int = 0,
    isda_dim: int = 0,
) -> TrainState:
    from exploremultimodal_tpu.models.heads import ISDAState

    ema = jax.tree_util.tree_map(jnp.copy, params) if use_ema else None
    model_ema = (
        jax.tree_util.tree_map(jnp.copy, params) if use_model_ema else None
    )
    img_q = txt_q = ptr = None
    if queue_size:
        k1, k2, rng = jax.random.split(rng, 3)
        img_q = jax.random.normal(k1, (itc_dim, queue_size))
        txt_q = jax.random.normal(k2, (itc_dim, queue_size))
        img_q = img_q / jnp.linalg.norm(img_q, axis=0, keepdims=True)
        txt_q = txt_q / jnp.linalg.norm(txt_q, axis=0, keepdims=True)
        ptr = jnp.zeros((), jnp.int32)
    isda = (
        ISDAState.create(isda_classes, isda_dim) if isda_classes else None
    )
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        # the optimizer covers only the phase's gradient-reachable subtree
        # (trainer.frozen_pred; torch grad-None skip semantics) — frozen
        # params carry no moments at all
        opt_state=opt.init(trainable if trainable is not None else params),
        rng=rng,
        ema_params=ema,
        ema_decay=ema_decay,
        model_ema_params=model_ema,
        model_ema_decay=model_ema_decay,
        img_queue=img_q,
        txt_queue=txt_q,
        queue_ptr=ptr,
        isda=isda,
    )


def ema_update(ema_params: Any, params: Any, decay: float) -> Any:
    """timm ModelEmaV2 update (vlmo_module.py:124-127)."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params,
        params,
    )


def queue_update(
    img_queue: jax.Array,
    txt_queue: jax.Array,
    ptr: jax.Array,
    i_feat: jax.Array,
    t_feat: jax.Array,
    axis_name: str | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """dequeue_and_enqueue (objectives.py:438-465): gather features across the
    data axis, write at ptr with wraparound, advance ptr."""
    from exploremultimodal_tpu.parallel import concat_all_gather

    i_all = concat_all_gather(i_feat, axis_name).T  # (dim, B·world)
    t_all = concat_all_gather(t_feat, axis_name).T
    q_size = img_queue.shape[1]
    n = i_all.shape[1]

    idx = (ptr + jnp.arange(n)) % q_size
    img_queue = img_queue.at[:, idx].set(i_all)
    txt_queue = txt_queue.at[:, idx].set(t_all)
    return img_queue, txt_queue, (ptr + n) % q_size
