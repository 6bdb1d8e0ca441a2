"""One-step TRAINING parity vs the torch oracle (VERDICT r4 ask 4).

Same vlmo_debug init + same batch: the production jax path (VlmoTask MLM
forward with the fixed-shape masked CE, objectives/losses.py →
create_optimizer's optax chain, train/optim.py) against an independent
torch recompute (tests/torch_oracle.py forward + boolean-indexed CE —
the reference's dynamic-shape gather semantics, objectives.py:52-57 —
+ torch.optim.AdamW with the reference's layered param groups,
utils/optim_factory.py:22-90 + clip_grad_norm_, utils/utils.py:337-390).

Asserts, at fp32 tolerance: (1) the loss values are identical, (2) the
gradient trees match leaf-for-leaf, (3) the post-step parameters match —
i.e. the whole training numerics (loss → backward → clip → AdamW with
layered LR + decoupled wd) reproduce the torch recipe.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch
import torch.nn.functional as F

from exploremultimodal_tpu.config import load_config
from exploremultimodal_tpu.models import build_model
from exploremultimodal_tpu.models.task import VlmoTask
from exploremultimodal_tpu.train.optim import (
    create_optimizer,
    merge_frozen,
    phase_frozen_predicate,
    split_frozen,
)
from tests import torch_oracle as oracle

pytestmark = pytest.mark.quick

B, L = 4, 16
BASE_LR = 2.0e-4
WD = 0.01
CLIP = 1.0
LR_MULT = 5.0  # pretrain_txt lr_mult_head == lr_mult_fusion == 5


def _cfg():
    return load_config([
        "model=vlmo_debug",
        "train=pretrain_txt",
        "train.loss_names=[mlm]",
        # compare true gradients everywhere (fixed_attn freezing is covered
        # by test_frozen_params/test_optim)
        "train.fixed_attn=false",
        "train.warmup_epochs=0",
        "train.warmup_steps=0",
        f"train.clip_grad={CLIP}",
        f"model.max_text_len={L}",
        "compute_dtype=float32",
        "model.drop_rate=0.0",
        "model.attn_drop_rate=0.0",
        "model.drop_path_rate=0.0",
    ])


def _batch():
    rng = np.random.default_rng(0)
    ids = rng.integers(999, 5000, (B, L))
    ids_mlm = ids.copy()
    mask = np.ones((B, L), np.int64)
    mask[2, 10:] = 0
    labels = np.full((B, L), -100, np.int64)
    for b in range(B):
        # 3 masked positions/row (gather cap = floor(0.375·16) = 6: no drops),
        # only at attended positions (collator masks real tokens only)
        pos = rng.choice(np.nonzero(mask[b])[0], size=3, replace=False)
        labels[b, pos] = ids[b, pos]
        ids_mlm[b, pos] = 103  # [MASK]
    return {
        "text_ids": jnp.asarray(ids),
        "text_ids_mlm": jnp.asarray(ids_mlm),
        "text_labels_mlm": jnp.asarray(labels),
        "text_mask": jnp.asarray(mask, jnp.int32),
    }


def _export_task(params):
    """Full VlmoTask param tree → flat torch dict (oracle names for the
    backbone; mlm_head.* for the head)."""
    w = oracle.export_backbone_weights(params["transformer"])
    for name, t in oracle.export_backbone_weights(
        {"mlm_head": params["mlm_head"]}
    ).items():
        w[name] = t
    return w


def _torch_loss(w, depth, num_heads, fusion_layer, batch):
    feats, _ = oracle.forward_features(
        w, depth, num_heads, fusion_layer,
        txt=torch.from_numpy(np.asarray(batch["text_ids_mlm"])),
        txt_mask=torch.from_numpy(np.asarray(batch["text_mask"], np.int64)),
    )
    h = F.linear(feats, w["mlm_head.transform_dense.kernel"],
                 w["mlm_head.transform_dense.bias"])
    h = F.gelu(h)
    h = F.layer_norm(h, (h.shape[-1],), w["mlm_head.transform_ln.scale"],
                     w["mlm_head.transform_ln.bias"], eps=1e-12)
    logits = (
        h @ w["txt_embeddings.word_embeddings.embedding"].T
        + w["mlm_head.bias"]
    )
    labels = torch.from_numpy(np.asarray(batch["text_labels_mlm"], np.int64))
    sel = labels != -100
    # reference semantics: boolean-index the masked positions, mean CE
    # (objectives.py:52-57) — must equal the fixed-shape gathered CE
    return F.cross_entropy(logits[sel], labels[sel])


def _lr_mult(name: str, fusion_layer: int, depth: int) -> float:
    if name.startswith("mlm_head"):
        return LR_MULT
    fusion = {f"blocks_{i}." for i in range(fusion_layer, depth)}
    if any(b in name for b in fusion) or "pooler" in name:
        return LR_MULT
    return 1.0


def _decayed(name: str, t: torch.Tensor) -> bool:
    skip = ("itc_temp", "pos_embed", "img_cls_token", "img_mask_token")
    if any(s in name for s in skip):
        return False
    return t.ndim > 1 and not name.endswith("bias")


def test_one_training_step_matches_torch_adamw():
    cfg = _cfg()
    task = build_model(cfg)
    batch = _batch()
    variables = task.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        batch, method=VlmoTask.init_streams,
    )
    params = variables["params"]
    m = cfg.model
    fwd_batch = dict(batch)
    fwd_batch["image"] = None

    # --- jax: production loss → grads → optax chain ----------------------
    frozen_pred = phase_frozen_predicate(("mlm",), "pretrain_txt")
    trainable, frozen = split_frozen(params, frozen_pred)

    def loss_fn(p):
        out = task.apply({"params": merge_frozen(p, frozen)}, fwd_batch,
                         deterministic=True)
        return out["mlm_task_loss"]

    loss_j, grads = jax.value_and_grad(loss_fn)(trainable)
    opt, _sched = create_optimizer(cfg, trainable, steps_per_epoch=10)
    updates, _ = opt.update(grads, opt.init(trainable), trainable)
    new_trainable = optax.apply_updates(trainable, updates)

    # --- torch: oracle loss → autograd → clip → AdamW groups -------------
    w = _export_task(params)
    for t in w.values():
        t.requires_grad_(True)
    loss_t = _torch_loss(w, m.depth, m.num_heads, m.fusion_layer, batch)
    np.testing.assert_allclose(float(loss_j), float(loss_t),
                               rtol=1e-5, atol=1e-6)
    loss_t.backward()

    # grads: every trainable flax leaf must match the torch grad (the
    # torch-grad-None set must equal the frozen split — test_frozen_params)
    grads_flat = _export_task(
        {"transformer": merge_frozen(grads, None)["transformer"],
         "mlm_head": grads["mlm_head"]}
    )
    n_checked = 0
    for name, g in grads_flat.items():
        gt = w[name].grad
        assert gt is not None, f"torch has no grad for trainable leaf {name}"
        np.testing.assert_allclose(
            g.detach().numpy(), gt.numpy(), rtol=2e-4, atol=1e-6,
            err_msg=f"grad mismatch at {name}",
        )
        n_checked += 1
    assert n_checked > 20

    with_grad = [t for t in w.values() if t.grad is not None]
    torch.nn.utils.clip_grad_norm_(with_grad, CLIP)
    groups = []
    for name, t in w.items():
        if t.grad is None:
            continue
        groups.append({
            "params": [t],
            "lr": BASE_LR * _lr_mult(name, m.fusion_layer, m.depth),
            "weight_decay": WD if _decayed(name, t) else 0.0,
        })
    torch.optim.AdamW(groups, betas=(0.9, 0.98), eps=1e-8).step()

    # post-step params: fp32 tolerance. The first-step adamw update is
    # ~lr·mult·g/(|g|+eps) ≈ ±1e-3·mult; where |g| ~ eps the quotient
    # amplifies fp32 forward noise (measured: 2/36864 elements at 2.8e-6
    # in one mlp kernel), so atol sits just above that amplification while
    # staying ~200× below the update magnitude.
    new_flat = _export_task(
        {"transformer": new_trainable["transformer"],
         "mlm_head": new_trainable["mlm_head"]}
    )
    for name, p in new_flat.items():
        np.testing.assert_allclose(
            p.detach().numpy(), w[name].detach().numpy(),
            rtol=1e-5, atol=5e-6, err_msg=f"updated param mismatch at {name}",
        )
