"""Optimizer factory: AdamW + layered LR groups + per-iteration schedules.

Reference parity:
  - get_parameter_groups (utils/optim_factory.py:22-90): head params ×
    lr_mult_head, fusion params (blocks[fusion_layer:] + pooler) ×
    lr_mult_fusion, everything else ×1; no weight decay for 1-D params,
    biases, and the skip set {itc_temp, pos_embed, img_cls_token}
    (vlmo_module.py:438-443)
  - build_scheduler (utils/lr_scheduler.py): linear (decay to 1% of base) /
    cosine / step, all stepped per iteration with linear warmup
  - Apex FusedAdam → optax.adamw (XLA fuses the update)
  - fixed_attn freezing (pretrain_txt, vlmo_module.py:150-163) as a 0×
    multiplier instead of requires_grad surgery

Composition: clip_by_global_norm → scale_by_adam → add_decayed_weights(mask)
→ −lr(schedule) → per-leaf multiplier. Weight decay therefore scales with the
group LR, matching torch AdamW group semantics.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax


def build_schedule(train_cfg: Any, steps_per_epoch: int) -> optax.Schedule:
    total_steps = int(train_cfg.epochs * steps_per_epoch)
    warmup = int(train_cfg.warmup_epochs * steps_per_epoch)
    if train_cfg.get("warmup_steps"):
        warmup = int(train_cfg.warmup_steps)
    warmup = min(warmup, max(total_steps - 1, 1))
    base = float(train_cfg.base_lr)
    warmup_lr = float(train_cfg.get("warmup_lr", 0.0))
    min_lr = float(train_cfg.get("min_lr", 0.0))
    name = train_cfg.lr_scheduler.name

    if name == "linear":
        # LinearLRScheduler (lr_scheduler.py:49-108): decay to 1% of base
        decay = optax.linear_schedule(
            base, base * 0.01, max(total_steps - warmup, 1)
        )
    elif name == "cosine":
        decay = optax.cosine_decay_schedule(
            base, max(total_steps - warmup, 1), alpha=min_lr / base
        )
    elif name == "step":
        decay_steps = int(train_cfg.lr_scheduler.decay_epochs * steps_per_epoch)
        rate = float(train_cfg.lr_scheduler.decay_rate)
        decay = lambda t: base * rate ** (t // max(decay_steps, 1))  # noqa: E731
    else:
        raise ValueError(f"unknown lr scheduler {name!r}")

    warmup_fn = optax.linear_schedule(warmup_lr, base, max(warmup, 1))
    return optax.join_schedules([warmup_fn, decay], [warmup])


def build_wd_schedule(
    train_cfg: Any, steps_per_epoch: int
) -> optax.Schedule | None:
    """Per-iteration cosine weight-decay schedule weight_decay →
    weight_decay_end (reference cosine_scheduler wd path, utils.py:399-424;
    no warmup, unlike the lr schedule). None when the end value is unset or
    equal to the start (constant decay)."""
    wd = float(train_cfg.weight_decay)
    wd_end = train_cfg.get("weight_decay_end")
    if wd_end is None or float(wd_end) == wd:
        return None
    wd_end = float(wd_end)
    total = max(int(train_cfg.epochs * steps_per_epoch), 1)

    def schedule(count):
        frac = jnp.clip(count / total, 0.0, 1.0)
        return wd_end + 0.5 * (wd - wd_end) * (1.0 + jnp.cos(jnp.pi * frac))

    return schedule


def add_decayed_weights_scheduled(
    wd_schedule: optax.Schedule, mask: Any
) -> optax.GradientTransformation:
    """optax.add_decayed_weights with a per-step decay value (optax's own
    takes only a constant)."""

    def init_fn(params):
        del params
        return {"count": jnp.zeros((), jnp.int32)}

    def update_fn(updates, state, params):
        wd = wd_schedule(state["count"])
        updates = jax.tree_util.tree_map(
            lambda u, p, m: u + wd * p if m else u, updates, params, mask
        )
        return updates, {"count": state["count"] + 1}

    return optax.GradientTransformation(init_fn, update_fn)


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", p)) for p in path)


HEAD_NAMES = (
    "mlm_head", "itc_head", "itm_head", "mim_head", "mpp_head",
    "vqa_classifier", "nlvr2_classifier", "rank_output",
    "img_classifier", "mae_head", "ref_head",
)


def lr_multipliers(
    params: Any,
    fusion_layer: int,
    depth: int,
    lr_mult_head: float = 1.0,
    lr_mult_fusion: float = 1.0,
    freeze_predicate: Callable[[str], bool] | None = None,
) -> Any:
    """Per-leaf LR multiplier tree (get_parameter_groups semantics)."""
    fusion_blocks = {f"blocks_{i}" for i in range(fusion_layer, depth)}

    def mult(path, leaf):
        name = _path_str(path)
        if freeze_predicate is not None and freeze_predicate(name):
            return 0.0
        if any(h in name for h in HEAD_NAMES):
            return float(lr_mult_head)
        if any(b in name for b in fusion_blocks) or "pooler" in name:
            return float(lr_mult_fusion)
        return 1.0

    return jax.tree_util.tree_map_with_path(mult, params)


def no_decay_mask(params: Any) -> Any:
    """True where weight decay applies (≥2-D, non-bias, not in skip set)."""
    skip = ("itc_temp", "pos_embed", "img_cls_token", "img_mask_token")

    def decayed(path, leaf):
        name = _path_str(path)
        if any(s in name for s in skip):
            return False
        if leaf.ndim <= 1 or name.endswith("bias"):
            return False
        return True

    return jax.tree_util.tree_map_with_path(decayed, params)


def phase_frozen_predicate(
    loss_names: tuple[str, ...],
    phase: str | None = None,
    mim_head_pos: str = "img",
):
    """Static no-gradient-path set for a phase's loss composition.

    torch optimizers skip params whose .grad stays None — in the reference a
    text-only phase (pretrain_txt) never touches the vision experts / patch
    embedding, so AdamW never weight-decays them (optim_factory.py builds
    groups from requires_grad params; torch.optim skips grad-None). Under
    optax every leaf gets a (zero) gradient, so without this mask the decay
    term would silently shrink untouched params. The gradient graph is
    STATIC per phase (routes are trace-time), so the no-grad set is derivable
    from the loss composition; tests/test_frozen_params.py checks it against
    the actual gradients (every frozen leaf must have exactly-zero grads).

    Returns a path-predicate naming the frozen subtree, or None when every
    parameter can receive gradients (the predicate then must not be applied).
    """
    losses = set(loss_names)
    if not losses:
        return None
    # conservative: imgcls may run either img-only (finetune_vis arrows carry
    # no captions) or paired — treat it as touching text+fused
    mim_fused = "mim" in losses and mim_head_pos == "mum"
    text_used = bool(losses & {
        "mlm", "itc", "itm", "irtr", "vqa", "nlvr2", "mpp", "caption",
        "refcoco", "inpainting", "imgcls",
    }) or mim_fused
    image_used = bool(losses & {
        "mim", "mpp", "mae", "imgcls", "itc", "itm", "irtr", "vqa", "nlvr2",
        "caption", "refcoco", "inpainting",
    })
    masked_image_used = bool(losses & {"mim", "mpp", "mae"})
    fused_used = bool(losses & {
        "itm", "vqa", "nlvr2", "mpp", "irtr", "caption", "refcoco",
        "inpainting", "imgcls",
    }) or ("mlm" in losses and image_used) or mim_fused
    pooled_used = bool(
        losses & {"itm", "vqa", "nlvr2", "irtr", "imgcls", "refcoco"}
    )

    frozen: set[str] = set()
    if not text_used:
        frozen |= {"txt_embeddings", "mlp_l"}
    if not image_used:
        frozen |= {"patch_embed", "pos_embed", "img_cls_token", "mlp_v"}
    if not masked_image_used:
        frozen.add("img_mask_token")
    if not fused_used:
        frozen.add("mlp_vl")
    if not pooled_used:
        frozen.add("pooler")
    if not frozen:
        return None

    def pred(name: str) -> bool:
        return any(seg in frozen for seg in name.split("/"))

    return pred


def split_frozen(params: Any, frozen_pred) -> tuple[Any, Any]:
    """(trainable, frozen) param subtrees. With frozen_pred None the params
    pass through untouched (frozen side None) so the compiled step is
    bit-identical to the unsplit one for all-trainable phases."""
    if frozen_pred is None:
        return params, None
    from flax import traverse_util
    from flax.core import unfreeze

    flat = traverse_util.flatten_dict(unfreeze(params), sep="/")
    trainable = {k: v for k, v in flat.items() if not frozen_pred(k)}
    frozen = {k: v for k, v in flat.items() if frozen_pred(k)}
    if not frozen:
        return params, None
    return (
        traverse_util.unflatten_dict(trainable, sep="/"),
        traverse_util.unflatten_dict(frozen, sep="/"),
    )


def merge_frozen(trainable: Any, frozen: Any) -> Any:
    if frozen is None:
        return trainable
    from flax import traverse_util

    flat = {
        **traverse_util.flatten_dict(trainable, sep="/"),
        **traverse_util.flatten_dict(frozen, sep="/"),
    }
    return traverse_util.unflatten_dict(flat, sep="/")


def fixed_attn_predicate(name: str) -> bool:
    """pretrain_txt fixed_attn=true freeze set (vlmo_module.py:150-163):
    shared attention, block norms, gammas, and the final norm."""
    inside_block = "blocks_" in name
    if inside_block and any(
        part in name for part in ("attn", "norm1", "norm2", "gamma_1", "gamma_2")
    ):
        return True
    return name.startswith("transformer/norm/")


def scale_by_multipliers(multipliers: Any) -> optax.GradientTransformation:
    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        updates = jax.tree_util.tree_map(
            lambda u, m: u * m, updates, multipliers
        )
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def create_optimizer(
    cfg: Any,
    params: Any,
    steps_per_epoch: int,
) -> tuple[optax.GradientTransformation, optax.Schedule]:
    """Reference create_optimizer (optim_factory.py:93-199) for the adamw
    family (the reference default is apex fusedadamw)."""
    t = cfg.train
    schedule = build_schedule(t, steps_per_epoch)

    freeze = fixed_attn_predicate if t.get("fixed_attn") else None
    mults = lr_multipliers(
        params,
        cfg.model.fusion_layer,
        cfg.model.depth,
        lr_mult_head=t.get("lr_mult_head", 1.0),
        lr_mult_fusion=t.get("lr_mult_fusion", 1.0),
        freeze_predicate=freeze,
    )

    opt_name = t.opt.name.lower().replace("fused", "")
    lookahead = opt_name.startswith("lookahead_")
    if lookahead:
        opt_name = opt_name[len("lookahead_"):]

    scaler = _update_rule(opt_name, t.opt)
    decays_weights = opt_name in ("adamw", "lamb", "lars", "sgdw", "novograd")

    if decays_weights:
        wd_schedule = build_wd_schedule(t, steps_per_epoch)
        mask = no_decay_mask(params)
        decay = (
            add_decayed_weights_scheduled(wd_schedule, mask)
            if wd_schedule is not None
            else optax.add_decayed_weights(float(t.weight_decay), mask=mask)
        )
    else:
        decay = optax.identity()

    chain = [
        optax.clip_by_global_norm(float(t.clip_grad)) if t.get("clip_grad")
        else optax.identity(),
        scaler,
        decay,
        optax.scale_by_learning_rate(schedule),
        scale_by_multipliers(mults),
    ]
    opt = optax.chain(*chain)
    if lookahead:
        opt = slow_ema_lookahead(opt, sync_period=6, slow_step=0.5)
    return opt, schedule


def _update_rule(name: str, opt_cfg: Any) -> optax.GradientTransformation:
    """The reference's optimizer menu (optim_factory.py:93-199) mapped onto
    optax update rules (the fused-CUDA variants collapse onto their math;
    XLA fuses the update)."""
    b1, b2 = (float(b) for b in opt_cfg.get("betas", [0.9, 0.999]))
    eps = float(opt_cfg.get("eps", 1e-8))
    momentum = float(opt_cfg.get("momentum", 0.9))

    table: dict[str, Callable[[], optax.GradientTransformation]] = {
        "adam": lambda: optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
        "adamw": lambda: optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
        "nadam": lambda: optax.scale_by_adam(b1=b1, b2=b2, eps=eps, nesterov=True),
        "radam": lambda: optax.scale_by_radam(b1=b1, b2=b2, eps=eps),
        "lamb": lambda: optax.chain(
            optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
            optax.scale_by_trust_ratio(),
        ),
        "lars": lambda: optax.chain(
            optax.trace(decay=momentum),
            optax.scale_by_trust_ratio(),
        ),
        "sgd": lambda: optax.identity(),
        "momentum": lambda: optax.trace(decay=momentum),
        "nesterov": lambda: optax.trace(decay=momentum, nesterov=True),
        "rmsprop": lambda: optax.scale_by_rms(decay=0.9, eps=eps),
        "rmsproptf": lambda: optax.scale_by_rms(decay=0.9, eps=eps),
        "adadelta": lambda: optax.scale_by_adadelta(eps=eps),
        "adafactor": lambda: optax.scale_by_factored_rms(),
        "novograd": lambda: optax.scale_by_novograd(b1=b1, b2=b2, eps=eps),
        "lion": lambda: optax.scale_by_lion(b1=b1, b2=b2),
    }
    if name not in table:
        raise NotImplementedError(
            f"optimizer {name!r}; available: {sorted(table)} (+ lookahead_ prefix)"
        )
    return table[name]()


def slow_ema_lookahead(
    inner: optax.GradientTransformation, sync_period: int = 6,
    slow_step: float = 0.5,
) -> optax.GradientTransformation:
    """Lookahead wrapper (reference wraps timm Lookahead,
    optim_factory.py:193-195): keep slow weights; every `sync_period` steps
    pull the fast weights `slow_step` of the way back and restart from there.
    Implemented as state (slow copy + counter) so the train state stays a
    plain param tree."""

    def init_fn(params):
        return {
            "inner": inner.init(params),
            "slow": jax.tree_util.tree_map(jnp.copy, params),
            "count": jnp.zeros((), jnp.int32),
        }

    def update_fn(updates, state, params):
        inner_updates, inner_state = inner.update(updates, state["inner"], params)
        fast = optax.apply_updates(params, inner_updates)
        count = state["count"] + 1
        sync = (count % sync_period) == 0

        new_slow = jax.tree_util.tree_map(
            lambda s, f: jnp.where(sync, s + slow_step * (f - s), s),
            state["slow"], fast,
        )
        target = jax.tree_util.tree_map(
            lambda f, ns: jnp.where(sync, ns, f), fast, new_slow
        )
        final_updates = jax.tree_util.tree_map(
            lambda tgt, p: tgt - p, target, params
        )
        return final_updates, {
            "inner": inner_state, "slow": new_slow, "count": count,
        }

    return optax.GradientTransformation(init_fn, update_fn)


def global_norm(tree: Any) -> jax.Array:
    return jnp.sqrt(
        sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in jax.tree.leaves(tree))
    )
