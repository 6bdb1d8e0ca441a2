import jax
import jax.numpy as jnp
import numpy as np
import optax

from exploremultimodal_tpu.config import load_config
from exploremultimodal_tpu.train.optim import (
    build_schedule,
    create_optimizer,
    fixed_attn_predicate,
    lr_multipliers,
    no_decay_mask,
)


def fake_params():
    return {
        "transformer": {
            "pos_embed": jnp.zeros((1, 5, 8)),
            "img_cls_token": jnp.zeros((1, 1, 8)),
            "blocks_0": {
                "attn": {"qkv": {"kernel": jnp.zeros((8, 24))},
                         "q_bias": jnp.zeros((8,))},
                "norm1": {"scale": jnp.ones((8,)), "bias": jnp.zeros((8,))},
                "gamma_1": jnp.ones((8,)),
                "mlp_l": {"fc1": {"kernel": jnp.zeros((8, 32)),
                                  "bias": jnp.zeros((32,))}},
            },
            "blocks_1": {
                "mlp_v": {"fc1": {"kernel": jnp.zeros((8, 32))}},
            },
            "norm": {"scale": jnp.ones((8,))},
            "pooler": {"dense": {"kernel": jnp.zeros((8, 8))}},
        },
        "mlm_head": {"transform_dense": {"kernel": jnp.zeros((8, 8))}},
        "itc_temp": jnp.zeros(()),
    }


def test_linear_schedule_warmup_and_decay():
    cfg = load_config(["train=pretrain_mum"]).train
    cfg.warmup_steps = 10
    cfg.epochs = 10
    sched = build_schedule(cfg, steps_per_epoch=100)
    base = cfg.base_lr
    np.testing.assert_allclose(float(sched(0)), float(cfg.warmup_lr), rtol=1e-3)
    np.testing.assert_allclose(float(sched(10)), base, rtol=1e-5)
    # linear decay to 1% at the end (LinearLRScheduler lr_min_rate=0.01)
    np.testing.assert_allclose(float(sched(1000)), base * 0.01, rtol=1e-2)
    assert float(sched(500)) < base


def test_lr_multipliers_groups():
    params = fake_params()
    mults = lr_multipliers(params, fusion_layer=1, depth=2,
                           lr_mult_head=50, lr_mult_fusion=5)
    assert mults["mlm_head"]["transform_dense"]["kernel"] == 50
    assert mults["transformer"]["blocks_1"]["mlp_v"]["fc1"]["kernel"] == 5
    assert mults["transformer"]["pooler"]["dense"]["kernel"] == 5
    assert mults["transformer"]["blocks_0"]["attn"]["qkv"]["kernel"] == 1
    assert mults["transformer"]["pos_embed"] == 1


def test_no_decay_mask_semantics():
    params = fake_params()
    mask = no_decay_mask(params)
    assert mask["transformer"]["blocks_0"]["attn"]["qkv"]["kernel"] is True
    # 1-D, biases, skip set → no decay
    assert mask["transformer"]["blocks_0"]["norm1"]["scale"] is False
    assert mask["transformer"]["blocks_0"]["mlp_l"]["fc1"]["bias"] is False
    assert mask["transformer"]["pos_embed"] is False
    assert mask["transformer"]["img_cls_token"] is False
    assert mask["itc_temp"] is False


def test_fixed_attn_freeze_predicate():
    assert fixed_attn_predicate("transformer/blocks_0/attn/qkv/kernel")
    assert fixed_attn_predicate("transformer/blocks_3/norm2/scale")
    assert fixed_attn_predicate("transformer/blocks_1/gamma_1")
    assert fixed_attn_predicate("transformer/norm/scale")
    assert not fixed_attn_predicate("transformer/blocks_0/mlp_l/fc1/kernel")
    assert not fixed_attn_predicate("transformer/txt_embeddings/word_embeddings/embedding")
    assert not fixed_attn_predicate("mlm_head/bias")


def test_optimizer_applies_multiplier_and_freezing():
    cfg = load_config(["train=pretrain_txt", "model=vlmo_debug"])
    cfg.train.fixed_attn = True
    cfg.train.clip_grad = 0  # isolate the multiplier path
    params = fake_params()
    opt, sched = create_optimizer(cfg, params, steps_per_epoch=10)
    state = opt.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = opt.update(grads, state, params)
    # frozen attention gets exactly zero update
    np.testing.assert_array_equal(
        np.asarray(updates["transformer"]["blocks_0"]["attn"]["qkv"]["kernel"]),
        0.0,
    )
    np.testing.assert_array_equal(
        np.asarray(updates["transformer"]["norm"]["scale"]), 0.0
    )
    # unfrozen expert moves
    assert np.abs(
        np.asarray(updates["transformer"]["blocks_0"]["mlp_l"]["fc1"]["kernel"])
    ).max() > 0


def test_head_multiplier_scales_update():
    cfg = load_config(["train=finetune_vqa", "model=vlmo_debug"])
    cfg.train.clip_grad = 0
    cfg.train.warmup_steps = 0
    cfg.train.warmup_epochs = 0
    params = {
        "transformer": {"blocks_0": {"attn": {"qkv": {"kernel": jnp.zeros((4, 4))}}}},
        "vqa_classifier": {"fc2": {"kernel": jnp.zeros((4, 4))}},
    }
    opt, _ = create_optimizer(cfg, params, steps_per_epoch=10)
    state = opt.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = opt.update(grads, state, params)
    bottom = np.asarray(updates["transformer"]["blocks_0"]["attn"]["qkv"]["kernel"])
    head = np.asarray(updates["vqa_classifier"]["fc2"]["kernel"])
    np.testing.assert_allclose(head, bottom * 50, rtol=1e-5)  # lr_mult_head=50


def test_optimizer_menu():
    """Reference optimizer choices (optim_factory.py:93-199) all construct and
    produce finite updates."""
    from exploremultimodal_tpu.train.optim import _update_rule, slow_ema_lookahead

    cfg = load_config(["train=pretrain_mum", "model=vlmo_debug"])
    params = {"w": jnp.ones((16, 16)), "b": jnp.zeros((16,))}
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    for name in ("adam", "adamw", "nadam", "radam", "lamb", "lars", "sgd",
                 "momentum", "nesterov", "rmsprop", "adadelta", "adafactor",
                 "novograd", "lion"):
        cfg.train.opt.name = name
        opt, _ = create_optimizer(cfg, params, steps_per_epoch=10)
        state = opt.init(params)
        updates, _ = opt.update(grads, state, params)
        for leaf in jax.tree.leaves(updates):
            assert np.isfinite(np.asarray(leaf)).all(), name

    import pytest

    cfg.train.opt.name = "unknown_opt"
    with pytest.raises(NotImplementedError):
        create_optimizer(cfg, params, steps_per_epoch=10)


def test_lookahead_sync_semantics():
    from exploremultimodal_tpu.train.optim import slow_ema_lookahead

    inner = optax.sgd(0.1)
    opt = slow_ema_lookahead(inner, sync_period=2, slow_step=0.5)
    params = {"w": jnp.asarray(1.0)}
    state = opt.init(params)
    grads = {"w": jnp.asarray(1.0)}

    # step 1 (no sync): plain sgd: 1.0 - 0.1 = 0.9
    u, state = opt.update(grads, state, params)
    params = optax.apply_updates(params, u)
    np.testing.assert_allclose(float(params["w"]), 0.9, rtol=1e-6)

    # step 2 (sync): fast would be 0.8; slow = 1.0 + 0.5*(0.8-1.0) = 0.9
    u, state = opt.update(grads, state, params)
    params = optax.apply_updates(params, u)
    np.testing.assert_allclose(float(params["w"]), 0.9, rtol=1e-6)
    np.testing.assert_allclose(float(state["slow"]["w"]), 0.9, rtol=1e-6)


def test_weight_decay_schedule():
    """weight_decay_end drives a per-iteration cosine decay schedule
    (reference cosine_scheduler wd path, utils.py:399-424) — round-1 finding:
    the flag existed in YAMLs but nothing read it."""
    from exploremultimodal_tpu.train.optim import (
        add_decayed_weights_scheduled,
        build_wd_schedule,
    )

    cfg = load_config(["train=pretrain_mum"])
    cfg.train.weight_decay = 0.05
    cfg.train.weight_decay_end = 0.4
    cfg.train.epochs = 1
    sched = build_wd_schedule(cfg.train, steps_per_epoch=100)
    assert sched is not None
    np.testing.assert_allclose(float(sched(0)), 0.05, rtol=1e-6)
    np.testing.assert_allclose(float(sched(100)), 0.4, rtol=1e-6)
    mid = float(sched(50))
    assert 0.05 < mid < 0.4

    # equal start/end (the YAML defaults) → constant decay, no schedule
    cfg.train.weight_decay_end = 0.05
    assert build_wd_schedule(cfg.train, 100) is None

    # the transform adds wd(t)·p only where the mask is True
    params = {"w": jnp.ones((4, 4)), "b": jnp.ones((4,))}
    mask = {"w": True, "b": False}
    cfg.train.weight_decay_end = 0.4
    tx = add_decayed_weights_scheduled(
        build_wd_schedule(cfg.train, 100), mask
    )
    state = tx.init(params)
    zero_up = jax.tree.map(jnp.zeros_like, params)
    up, state = tx.update(zero_up, state, params)
    np.testing.assert_allclose(np.asarray(up["w"]), 0.05, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(up["b"]), 0.0)
    assert int(state["count"]) == 1

    # end-to-end: create_optimizer picks the scheduled transform up
    cfg2 = load_config(["train=pretrain_mum"])
    cfg2.train.weight_decay = 0.05
    cfg2.train.weight_decay_end = 0.4
    cfg2.model.fusion_layer, cfg2.model.depth = 1, 2
    p = fake_params()
    opt, _ = create_optimizer(cfg2, p, steps_per_epoch=10)
    s = opt.init(p)
    g = jax.tree.map(jnp.zeros_like, p)
    u, _ = opt.update(g, s, p)
    # decayed param got a nonzero update from wd alone
    assert np.abs(np.asarray(
        u["transformer"]["pooler"]["dense"]["kernel"]
    )).sum() == 0.0  # kernel is zeros → wd·0 = 0
    p2 = jax.tree_util.tree_map(lambda x: jnp.ones_like(x), p)
    s2 = opt.init(p2)
    u2, _ = opt.update(g, s2, p2)
    assert np.abs(np.asarray(
        u2["transformer"]["pooler"]["dense"]["kernel"]
    )).sum() > 0.0


def test_flat_loss_equal_gradient_weighting():
    """flat_loss=true: each task loss contributes v/stop_grad(v), so the
    total's gradient weights every task equally regardless of magnitude
    (reference multimodal.py:301-307)."""
    from exploremultimodal_tpu.models.task import total_loss

    def outputs(w):
        return {
            "a_task_loss": 100.0 * w,     # huge loss
            "b_task_loss": 0.01 * w,      # tiny loss
        }

    w = jnp.asarray(2.0)
    g_plain = jax.grad(lambda w: total_loss(outputs(w)))(w)
    g_flat = jax.grad(lambda w: total_loss(outputs(w), flat=True))(w)
    np.testing.assert_allclose(float(g_plain), 100.01, rtol=1e-5)
    # flat: d/dw (100w/(100w) + 0.01w/(0.01w)) at detached denominators
    # = 100/(100·2) + 0.01/(0.01·2) = 1.0
    np.testing.assert_allclose(float(g_flat), 1.0, rtol=1e-5)
    # value is number-of-tasks at the evaluation point
    np.testing.assert_allclose(
        float(total_loss(outputs(w), flat=True)), 2.0, rtol=1e-6
    )
