"""Phase no-grad-path skip (torch optimizer semantics).

torch optimizers skip params whose .grad is None — in the reference, a
text-only phase never gives the vision experts gradients, so AdamW never
weight-decays them (optim_factory.py builds groups per requires_grad;
torch.optim skips grad-None). optax materializes zero grads for every leaf,
so exploremultimodal_tpu derives the static no-grad set per phase
(train/optim.py phase_frozen_predicate) and excludes it from autodiff and
the optimizer. These tests pin (a) the predicate against the ACTUAL gradient
graph — every frozen leaf must have exactly-zero grads — and (b) that train
steps leave frozen params bit-identical while weight decay is on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from exploremultimodal_tpu.config import load_config
from exploremultimodal_tpu.train.optim import (
    merge_frozen,
    phase_frozen_predicate,
    split_frozen,
)

TINY = [
    "model=vlmo_debug",
    "train.datasets=[synthetic]",
    "data.batch_size=4",
    "data.synthetic_size=8",
    "data.num_workers=0",
    "model.img_size=32",
    "model.embed_dim=32",
    "model.num_heads=2",
    "model.max_text_len=12",
    "data.num_mask_patches=2",
    "data.min_mask_patches_per_block=1",
    "train.warmup_steps=1",
    "train.epochs=2",
    "compute_dtype=float32",
    "attn_impl=xla",
]


def _trainer(tmp_path, extra):
    from exploremultimodal_tpu.train.trainer import Trainer

    cfg = load_config(TINY + [f"exp_dir={tmp_path}"] + list(extra))
    t = Trainer(cfg)
    loader = t.data.train_loader()
    batch = next(iter(t.feeder(iter(loader))))
    state = t.init_state(batch)
    return t, state, batch


def _flat(params):
    return traverse_util.flatten_dict(params, sep="/")


# ----------------------------------------------------------------- predicate


def test_predicate_all_trainable_for_mum():
    assert phase_frozen_predicate(("mlm", "itc", "itm", "mim")) is None


def test_predicate_pretrain_txt_freezes_vision_side():
    pred = phase_frozen_predicate(("mlm",), "pretrain_txt")
    assert pred is not None
    for frozen in (
        "transformer/patch_embed/kernel",
        "transformer/pos_embed",
        "transformer/img_cls_token",
        "transformer/img_mask_token",
        "transformer/blocks_0/mlp_v/fc1/kernel",
        "transformer/pooler/dense/kernel",
    ):
        assert pred(frozen), frozen
    for trained in (
        "transformer/txt_embeddings/word_embeddings/embedding",
        "transformer/blocks_0/mlp_l/fc1/kernel",
        "transformer/blocks_0/attn/qkv/kernel",
        "transformer/norm/scale",
        "mlm_head/dense/kernel",
    ):
        assert not pred(trained), trained


def test_predicate_pretrain_vis_freezes_text_side():
    pred = phase_frozen_predicate(("mim",), "pretrain_vis", "img")
    assert pred is not None
    for frozen in (
        "transformer/txt_embeddings/word_embeddings/embedding",
        "transformer/blocks_0/mlp_l/fc1/kernel",
        "transformer/blocks_6/mlp_vl/fc2/kernel",
        "transformer/pooler/dense/kernel",
    ):
        assert pred(frozen), frozen
    for trained in (
        "transformer/patch_embed/kernel",
        "transformer/img_mask_token",
        "transformer/blocks_0/mlp_v/fc1/kernel",
        "mim_head/decoder/kernel",
    ):
        assert not pred(trained), trained
    # mlp_v must not be caught by the mlp_vl rule or vice versa
    assert pred("transformer/blocks_6/mlp_vl/fc1/kernel")
    assert not pred("transformer/blocks_6/mlp_v/fc1/kernel")


def test_predicate_mim_mum_head_uses_text():
    pred = phase_frozen_predicate(("mim",), "pretrain_vis", "mum")
    # fused MIM head consumes text + the vl route; only the pooler is dead
    assert pred is not None
    assert pred("transformer/pooler/dense/kernel")
    assert not pred("transformer/txt_embeddings/word_embeddings/embedding")
    assert not pred("transformer/blocks_6/mlp_vl/fc1/kernel")


def test_split_merge_roundtrip():
    params = {
        "a": {"mlp_v": jnp.ones((2,)), "mlp_vl": jnp.zeros((3,))},
        "pooler": {"k": jnp.full((2,), 2.0)},
    }
    pred = lambda n: "pooler" in n.split("/")  # noqa: E731
    trainable, frozen = split_frozen(params, pred)
    assert "pooler" not in trainable and "a" in trainable
    merged = _flat(merge_frozen(trainable, frozen))
    orig = _flat(params)
    assert set(merged) == set(orig)
    for k in orig:
        np.testing.assert_array_equal(merged[k], orig[k])
    # identity split when nothing matches / predicate None
    t2, f2 = split_frozen(params, None)
    assert t2 is params and f2 is None
    t3, f3 = split_frozen(params, lambda n: False)
    assert t3 is params and f3 is None


# -------------------------------------------- predicate vs actual gradients


@pytest.mark.parametrize(
    "extra,phase_key",
    [
        (["train=pretrain_vis", "train.discrete_vae_type=random"], "mim"),
        (["train=pretrain_txt"], "mlm"),
    ],
)
def test_frozen_leaves_have_zero_grads(tmp_path, extra, phase_key):
    """Safety direction: the mask must never freeze a param that actually
    receives gradients — check against jax.grad of the real phase loss."""
    from exploremultimodal_tpu.models import total_loss

    trainer, state, batch = _trainer(tmp_path, extra)
    assert trainer.frozen_pred is not None
    model_batch = jax.jit(trainer._model_batch)(batch)

    def full_loss(params):
        outputs = trainer.task.apply(
            {"params": params}, model_batch, deterministic=True,
            rngs={"sample": jax.random.key(0)},
        )
        return total_loss(outputs)

    grads = jax.grad(full_loss)(state.params)
    flat_g = _flat(grads)
    frozen_names = [k for k in flat_g if trainer.frozen_pred(k)]
    trained_names = [k for k in flat_g if not trainer.frozen_pred(k)]
    assert frozen_names, "phase should freeze something"
    for k in frozen_names:
        assert not np.any(np.asarray(flat_g[k])), f"{k} got gradients"
    assert any(np.any(np.asarray(flat_g[k])) for k in trained_names)


# ------------------------------------------------------------- train steps


def test_pretrain_vis_step_skips_frozen(tmp_path):
    trainer, state, batch = _trainer(
        tmp_path, ["train=pretrain_vis", "train.discrete_vae_type=random",
                   "train.weight_decay=0.3"]
    )
    before = {k: np.asarray(v) for k, v in _flat(state.params).items()}
    step = trainer.make_train_step()
    for _ in range(3):
        state, metrics = step(state, batch, jnp.asarray(0.0))
    assert np.isfinite(float(metrics["total_loss"]))
    after = _flat(state.params)
    assert set(after) == set(before)
    pred = trainer.frozen_pred
    changed = 0
    for k in before:
        if pred(k):
            # bit-identical: no decay, no moments, no update at all
            np.testing.assert_array_equal(
                np.asarray(after[k]), before[k], err_msg=k
            )
        else:
            changed += int(not np.array_equal(np.asarray(after[k]), before[k]))
    assert changed > 0

    # the optimizer holds moments only for the trainable subtree
    n_param_leaves = len(jax.tree_util.tree_leaves(state.params))
    adam_mu = jax.tree_util.tree_leaves(state.opt_state)
    assert len(adam_mu) < 3 * n_param_leaves  # would be ≥3x if full tree


def test_pretrain_mum_unaffected(tmp_path):
    trainer, state, batch = _trainer(
        tmp_path, ["train=pretrain_mum", "train.discrete_vae_type=random"]
    )
    assert trainer.frozen_pred is None
    step = trainer.make_train_step()
    state, metrics = step(state, batch, jnp.asarray(0.0))
    assert np.isfinite(float(metrics["total_loss"]))
    assert float(metrics["grad_norm"]) > 0
