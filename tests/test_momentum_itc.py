"""Momentum-encoder + negative-queue ITC path (ALBEF-style,
objectives.py:110-164) and the EMA/queue state plumbing end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np

from exploremultimodal_tpu.config import load_config
from exploremultimodal_tpu.train.state import ema_update, queue_update
from exploremultimodal_tpu.utils.profiling import (
    NonFiniteLossError,
    check_finite_and_dump,
)

TINY = [
    "model=vlmo_debug",
    "train=pretrain_mum",
    "train.loss_names=[itc]",
    "train.datasets=[synthetic]",
    "data.batch_size=8",
    "data.synthetic_size=16",
    "data.num_workers=2",
    "model.img_size=32",
    "model.embed_dim=32",
    "model.num_heads=2",
    "model.max_text_len=12",
    "model.itc_dim=16",
    "model.drop_rate=0.0",
    "model.attn_drop_rate=0.0",
    "model.drop_path_rate=0.0",
    "data.num_mask_patches=2",
    "data.min_mask_patches_per_block=1",
    "train.warmup_steps=1",
    "compute_dtype=float32",
    "vlmo_ema=true",
    "train.neg_queue=true",
    "train.queue_size=64",
]


def test_momentum_queue_itc_train_step(tmp_path):
    from exploremultimodal_tpu.train.trainer import Trainer

    cfg = load_config(TINY + [f"exp_dir={tmp_path}"])
    trainer = Trainer(cfg)
    loader = trainer.data.train_loader()
    state = trainer.init_state(next(iter(loader)))
    assert state.ema_params is not None
    assert state.img_queue.shape == (16, 64)

    train_step = trainer.make_train_step()
    batch = next(iter(trainer.feeder(iter(loader))))
    ptr0 = int(state.queue_ptr)
    q0 = np.asarray(state.img_queue)
    ema0 = np.asarray(jax.tree.leaves(state.ema_params)[0])
    p0 = np.asarray(jax.tree.leaves(state.params)[0])

    state, metrics = train_step(state, batch, jnp.asarray(0.0))
    # in-modal losses present (momentum branch adds i2i/t2t)
    for k in ("itc_task_loss", "i2i_Loss", "t2t_Loss", "i2i_l_Loss", "t2t_l_Loss"):
        assert k in metrics and np.isfinite(float(metrics[k])), k

    # queue advanced by bs and got the new features written
    assert int(state.queue_ptr) == (ptr0 + 8) % 64
    assert not np.allclose(np.asarray(state.img_queue), q0)
    # queue columns are L2-normalized features
    written = np.asarray(state.img_queue)[:, ptr0:ptr0 + 8]
    np.testing.assert_allclose(np.linalg.norm(written, axis=0), 1.0, rtol=1e-4)

    # EMA moved toward the updated params but is not equal to them
    ema1 = np.asarray(jax.tree.leaves(state.ema_params)[0])
    p1 = np.asarray(jax.tree.leaves(state.params)[0])
    assert not np.array_equal(ema1, ema0)
    assert not np.array_equal(ema1, p1)


def test_image_aug_feeds_momentum_branch(tmp_path):
    """vlmo_ema=true must feed the EMA encoder a second INDEPENDENT
    augmented view (reference base_dataset.py:88-108 emits image_aug; round-1
    finding: no dataset produced it, so the momentum branch silently saw the
    identical view)."""
    from exploremultimodal_tpu.models import build_model
    from exploremultimodal_tpu.models.task import VlmoTask
    from exploremultimodal_tpu.ops.preprocess import preprocess_batch
    from exploremultimodal_tpu.train.trainer import Trainer

    cfg = load_config(TINY + [f"exp_dir={tmp_path}"])
    trainer = Trainer(cfg)
    batch = next(iter(trainer.feeder(iter(trainer.data.train_loader()))))
    assert "image_aug_u8" in batch
    assert not np.array_equal(
        np.asarray(batch["image_aug_u8"]), np.asarray(batch["image_u8"])
    )

    # the momentum features actually use the augmented view
    task = build_model(cfg)
    state = trainer.init_state(batch)
    model_batch = jax.jit(preprocess_batch)(
        {k: v for k, v in batch.items() if not isinstance(v, list)}
    )
    feats_aug = task.apply(
        {"params": state.ema_params}, model_batch,
        method=VlmoTask.itc_momentum_feats,
    )
    no_aug = {k: v for k, v in model_batch.items() if k != "image_aug"}
    feats_plain = task.apply(
        {"params": state.ema_params}, no_aug,
        method=VlmoTask.itc_momentum_feats,
    )
    assert not np.allclose(
        np.asarray(feats_aug["i_feat_m"]), np.asarray(feats_plain["i_feat_m"])
    )
    # text features identical — only the image view changes
    np.testing.assert_allclose(
        np.asarray(feats_aug["t_feat_m"]), np.asarray(feats_plain["t_feat_m"]),
        rtol=1e-5,
    )


def test_grad_accum_with_momentum_and_queue(tmp_path):
    """accumulation_steps=2 combined with vlmo_ema + neg_queue (the reference
    supports this; round-1 raised NotImplementedError): momentum features
    slice per microbatch, queue advances once per optimizer step, metrics
    stay finite."""
    from exploremultimodal_tpu.train.trainer import Trainer

    cfg = load_config(
        TINY + [f"exp_dir={tmp_path}", "train.accumulation_steps=2"]
    )
    trainer = Trainer(cfg)
    loader = trainer.data.train_loader()
    state = trainer.init_state(next(iter(loader)))
    train_step = trainer.make_train_step()
    batch = next(iter(trainer.feeder(iter(loader))))
    ptr0 = int(state.queue_ptr)

    state, metrics = train_step(state, batch, jnp.asarray(0.0))
    for k in ("itc_task_loss", "i2i_Loss", "t2t_Loss"):
        assert k in metrics and np.isfinite(float(metrics[k])), k
    # queue advanced by the FULL batch exactly once
    assert int(state.queue_ptr) == (ptr0 + 8) % 64
    # EMA updated
    assert state.ema_params is not None

    # second step still healthy (queue now holds real negatives)
    state, metrics = train_step(state, batch, jnp.asarray(0.0))
    assert np.isfinite(float(metrics["itc_task_loss"]))


def test_accum_momentum_negative_pool_equivalence(tmp_path):
    """VERDICT r2 #8: under accumulation each microbatch must contrast
    against the FULL batch's momentum features (negative pool accum-invariant,
    reference objectives.py:110-164 contrasts bs rows per forward). With a
    deterministic forward, microbatch ITC losses at their pos_offsets must
    average exactly to the full-batch loss — true only if every microbatch
    sees all N negatives with positives on the offset diagonal."""
    from exploremultimodal_tpu.models.task import VlmoTask
    from exploremultimodal_tpu.objectives.losses import compute_itc
    from exploremultimodal_tpu.train.trainer import Trainer

    cfg = load_config(TINY + [f"exp_dir={tmp_path}", "data.num_workers=0"])
    trainer = Trainer(cfg)
    loader = trainer.data.train_loader()
    batch = next(iter(trainer.feeder(iter(loader))))
    state = trainer.init_state(batch)
    model_batch = trainer._model_batch(batch)
    mfeats = trainer.task.apply(
        {"params": state.ema_params}, model_batch,
        method=VlmoTask.itc_momentum_feats,
    )
    queue = {"img": state.img_queue, "txt": state.txt_queue}

    def itc(mb, off):
        return trainer.task.apply(
            {"params": state.params}, mb, True,
            method=lambda task, b, det: compute_itc(
                task, b, det, momentum_feats=mfeats, queue=queue,
                pos_offset=off,
            ),
        )

    full = itc(model_batch, 0)
    accum = 2
    micro = [
        itc(
            jax.tree_util.tree_map(
                lambda v: v.reshape((accum, -1) + v.shape[1:])[i], model_batch
            ),
            i * 4,
        )
        for i in range(accum)
    ]
    # the sim matrices keep full-batch(+queue) columns — the negative pool
    # did not shrink to bs/accum
    assert micro[0]["sim_i2t"].shape == (4, 8 + 64)
    for key in ("i2t_Loss", "t2i_Loss", "i2i_Loss", "t2t_Loss",
                "i2i_l_Loss", "t2t_l_Loss", "itc_task_loss",
                "itc_i2t_mean_acc", "itc_t2i_mean_acc"):
        want = float(full[key])
        got = float(np.mean([float(m[key]) for m in micro]))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6, err_msg=key)


def test_accum_without_momentum_stays_naive_diagonal(tmp_path):
    """Regression: accumulation WITHOUT vlmo_ema takes the naive in-batch
    branch whose sims are (bs, bs) — pos_offset must NOT shift the targets
    there (shifted targets indexed out of bounds → NaN-filled metrics)."""
    from exploremultimodal_tpu.train.trainer import Trainer

    cfg = load_config([
        t for t in TINY
        if t not in ("vlmo_ema=true", "train.neg_queue=true",
                     "train.queue_size=64")
    ] + [f"exp_dir={tmp_path}", "train.accumulation_steps=2",
         "train.loss_names=[itc,itm]", "data.num_workers=0"])
    trainer = Trainer(cfg)
    loader = trainer.data.train_loader()
    state = trainer.init_state(next(iter(loader)))
    train_step = trainer.make_train_step()
    batch = next(iter(trainer.feeder(iter(loader))))
    state, metrics = train_step(state, batch, jnp.asarray(0.0))
    for k in ("i2t_Loss", "t2i_Loss", "itc_task_loss", "itm_task_loss",
              "total_loss"):
        assert np.isfinite(float(metrics[k])), k


def test_ema_update_math():
    ema = {"w": jnp.zeros((4,))}
    params = {"w": jnp.ones((4,))}
    out = ema_update(ema, params, decay=0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.1, rtol=1e-6)


def test_queue_update_wraparound():
    q = jnp.zeros((4, 10))
    ptr = jnp.asarray(8, jnp.int32)
    feats = jnp.ones((6, 4))  # 6 items into a 10-slot queue at ptr 8 → wraps
    img_q, txt_q, new_ptr = queue_update(q, q, ptr, feats, 2 * feats, None)
    assert int(new_ptr) == 4
    np.testing.assert_allclose(np.asarray(img_q)[:, 8:], 1.0)
    np.testing.assert_allclose(np.asarray(img_q)[:, :4], 1.0)
    np.testing.assert_allclose(np.asarray(img_q)[:, 4:8], 0.0)
    np.testing.assert_allclose(np.asarray(txt_q)[:, 9], 2.0)


def test_nonfinite_guard_dumps_and_raises(tmp_path):
    import pytest

    metrics = {"total_loss": jnp.asarray(np.nan), "mlm_task_loss": jnp.asarray(1.0)}
    with pytest.raises(NonFiniteLossError):
        check_finite_and_dump(metrics, step=3, output_dir=str(tmp_path))
    assert (tmp_path / "nan_dump_step3.npz").exists()
    # finite → no-op
    check_finite_and_dump({"total_loss": jnp.asarray(1.0)}, 4, str(tmp_path))


def test_patch_pooling_matches_torch_avg_pool2d_on_14x14():
    """196 patches (14×14, the real VLMo grid) pool with kernel=stride=3 and
    FLOOR truncation — torch F.avg_pool2d semantics (objectives.py:468-476).
    The old reshape-only version crashed on non-divisible grids."""
    import torch
    import torch.nn.functional as F

    from exploremultimodal_tpu.objectives.losses import patch_pooling

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 196, 8)).astype(np.float32)
    got = np.asarray(patch_pooling(jnp.asarray(x)))

    t = torch.from_numpy(x).reshape(2, 14, 14, 8).permute(0, 3, 1, 2)
    want = (
        F.avg_pool2d(t, 3, stride=3).permute(0, 2, 3, 1).reshape(2, -1, 8)
    ).numpy()
    assert got.shape == (2, 16, 8)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_dual_ema_trees_coexist(tmp_path):
    """vlmo_ema (ITC momentum encoder, decay 0.995) + model_ema (eval EMA,
    decay 0.9999) together — the reference holds BOTH trees
    (vlmo_module.py:120-131 and utils/utils.py:486-508, flags
    conf/config.yaml:136-141); round 2 raised ValueError on the combination."""
    from exploremultimodal_tpu.train.trainer import Trainer

    cfg = load_config(TINY + [
        f"exp_dir={tmp_path}", "model_ema=true", "model_ema_decay=0.9999",
    ])
    trainer = Trainer(cfg)
    loader = trainer.data.train_loader()
    state = trainer.init_state(next(iter(loader)))
    assert state.ema_params is not None
    assert state.model_ema_params is not None

    train_step = trainer.make_train_step()
    batch = next(iter(trainer.feeder(iter(loader))))
    p0 = np.asarray(jax.tree.leaves(state.params)[0])
    state, metrics = train_step(state, batch, jnp.asarray(0.0))
    assert np.isfinite(float(metrics["total_loss"]))

    p1 = np.asarray(jax.tree.leaves(state.params)[0])
    mom = np.asarray(jax.tree.leaves(state.ema_params)[0])
    ema = np.asarray(jax.tree.leaves(state.model_ema_params)[0])
    # both trees moved toward the new params at their own decay:
    # tree = p0*decay + p1*(1-decay)
    np.testing.assert_allclose(mom, p0 * 0.995 + p1 * 0.005, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(ema, p0 * 0.9999 + p1 * 0.0001, rtol=1e-5, atol=1e-7)
    assert not np.array_equal(mom, ema)

    # evaluate() uses the model_ema tree (not the momentum tree): eval with a
    # zeroed model_ema tree must differ from eval with real weights
    val = trainer.evaluate(state, trainer.data.train_loader())
    zeroed = state.replace(
        model_ema_params=jax.tree.map(jnp.zeros_like, state.model_ema_params)
    )
    val_zero = trainer.evaluate(zeroed, trainer.data.train_loader())
    assert val["total_loss"] != val_zero["total_loss"]
