"""Objective math tests on tiny fixed inputs (SURVEY.md §4 test strategy)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from exploremultimodal_tpu.models.task import VlmoConfig, VlmoTask, total_loss
from exploremultimodal_tpu.objectives.losses import (
    ITC_TEMP_MAX,
    compute_vqa_score,
    masked_cross_entropy,
    patch_pooling,
)

TINY = dict(
    img_size=32, patch_size=16, embed_dim=32, depth=2, num_heads=2,
    max_text_len=8, vocab_size=50, fusion_layer=1, init_values=0.1,
    drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.0,
    img_vocab_size=24, itc_dim=16, vqa_label_size=13,
)
N_PATCH = 4


def make_task(loss_names, phase="pretrain_mum", **kw):
    cfg = VlmoConfig(**{**TINY, **kw}, loss_names=tuple(loss_names), phase=phase)
    return VlmoTask(cfg)


def make_batch(rng_seed=0, bs=4, with_img=True, nlvr=False):
    rng = np.random.default_rng(rng_seed)
    L, V = TINY["max_text_len"], TINY["vocab_size"]
    batch = {
        "text_ids": jnp.asarray(rng.integers(0, V, (bs, L))),
        "text_mask": jnp.asarray(np.ones((bs, L), np.int32)),
    }
    ids_mlm = np.asarray(batch["text_ids"]).copy()
    labels = np.full((bs, L), -100)
    masked = rng.random((bs, L)) < 0.3
    masked[:, 0] = False
    labels[masked] = ids_mlm[masked]
    ids_mlm[masked] = 3  # [MASK]-ish
    batch["text_ids_mlm"] = jnp.asarray(ids_mlm)
    batch["text_labels_mlm"] = jnp.asarray(labels)
    if with_img:
        batch["image"] = jnp.asarray(
            rng.normal(size=(bs, 32, 32, 3)).astype(np.float32)
        )
        bmp = np.zeros((bs, N_PATCH), np.int32)
        bmp[:, :2] = 1
        batch["image_bool_masked_pos"] = jnp.asarray(bmp)
        batch["mim_labels"] = jnp.asarray(
            rng.integers(0, TINY["img_vocab_size"], (bs, N_PATCH))
        )
        batch["vqa_targets"] = jnp.asarray(
            (rng.random((bs, TINY["vqa_label_size"])) < 0.2).astype(np.float32)
        )
    if nlvr:
        batch["image_0"] = batch["image"]
        batch["image_1"] = jnp.asarray(
            rng.normal(size=(bs, 32, 32, 3)).astype(np.float32)
        )
        batch["answers"] = jnp.asarray(rng.integers(0, 2, (bs,)))
    return batch


def init_task(task, batch):
    return task.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        batch, method=VlmoTask.init_streams,
    )


# ----------------------------------------------------------------- helpers


def test_masked_cross_entropy_matches_torch():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(6, 10)).astype(np.float32)
    labels = rng.integers(0, 10, (6,))
    valid = np.array([1, 1, 0, 1, 0, 1])
    labels_t = np.where(valid > 0, labels, -100)

    loss, acc, count = masked_cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(valid)
    )
    ref = F.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(labels_t), ignore_index=-100
    )
    np.testing.assert_allclose(float(loss), float(ref), rtol=1e-6)
    assert int(count) == 4


def test_masked_ce_zero_count_safe():
    loss, acc, count = masked_cross_entropy(
        jnp.ones((2, 5)), jnp.zeros((2,), jnp.int32), jnp.zeros((2,))
    )
    assert np.isfinite(float(loss)) and int(count) == 0


def test_vqa_score_semantics():
    logits = jnp.asarray([[0.1, 5.0, 0.0], [9.0, 0.0, 0.0]])
    targets = jnp.asarray([[0.0, 0.6, 1.0], [0.0, 1.0, 0.3]])
    score, count = compute_vqa_score(logits, targets)
    # argmax answers: 1 (→0.6) and 0 (→0.0); mean = 0.3
    np.testing.assert_allclose(float(score), 0.3, rtol=1e-6)
    assert int(count) == 2


def test_patch_pooling_shape_and_mean():
    x = jnp.ones((2, 16, 8))  # 4×4 grid → 2×2 pool
    out = patch_pooling(x)
    assert out.shape == (2, 4, 8)
    np.testing.assert_allclose(np.asarray(out), 1.0)


# -------------------------------------------------------------- objectives


def test_mlm_txt_only_and_multimodal():
    task = make_task(["mlm"], phase="pretrain_txt")
    batch = make_batch(with_img=False)
    batch["image"] = None
    variables = init_task(task, {**make_batch(with_img=False), "image": None})
    out = task.apply(variables, batch, rngs={"sample": jax.random.key(2)})
    assert np.isfinite(float(out["mlm_task_loss"]))
    assert float(out["mlm_count"]) > 0

    task_mm = make_task(["mlm"], phase=None)
    batch_mm = make_batch()
    variables = init_task(task_mm, batch_mm)
    out = task_mm.apply(variables, batch_mm, rngs={"sample": jax.random.key(2)})
    assert np.isfinite(float(out["mlm_task_loss"]))


def test_itc_naive_math():
    task = make_task(["itc"], phase=None)
    batch = make_batch()
    variables = init_task(task, batch)
    out = task.apply(variables, batch, rngs={"sample": jax.random.key(2)})

    # recompute from returned features (projection already L2-normalized)
    i, t = np.asarray(out["itc_i_feat"]), np.asarray(out["itc_t_feat"])
    np.testing.assert_allclose(np.linalg.norm(i, axis=-1), 1.0, rtol=1e-5)
    temp = float(out["itc_temp"])
    sim = i @ t.T * temp
    bs = sim.shape[0]
    logp = sim - np.log(np.exp(sim).sum(-1, keepdims=True))
    expected_i2t = -np.diag(logp).mean()
    simT = sim.T
    logpT = simT - np.log(np.exp(simT).sum(-1, keepdims=True))
    expected = (expected_i2t + -np.diag(logpT).mean()) / 2
    np.testing.assert_allclose(float(out["itc_task_loss"]), expected, rtol=1e-4)


def test_itc_temp_clamped():
    task = make_task(["itc"], phase=None)
    batch = make_batch()
    variables = init_task(task, batch)
    params = jax.tree_util.tree_map(lambda x: x, variables["params"])
    params["itc_temp"] = jnp.asarray(10.0)  # way beyond log(100)
    out = task.apply({"params": params}, batch, rngs={"sample": jax.random.key(2)})
    np.testing.assert_allclose(float(out["itc_temp"]), np.exp(ITC_TEMP_MAX), rtol=1e-5)


def test_itm_with_and_without_itc_guidance():
    task = make_task(["itc", "itm"], phase=None)
    batch = make_batch()
    variables = init_task(task, batch)
    out = task.apply(variables, batch, rngs={"sample": jax.random.key(3)})
    assert np.isfinite(float(out["itm_task_loss"]))
    assert 0.0 <= float(out["itm_mean_acc"]) <= 1.0
    assert int(out["itm_count"]) == 3 * 4  # 3·bs pairs

    task2 = make_task(["itm"], phase=None)
    variables2 = init_task(task2, batch)
    out2 = task2.apply(variables2, batch, rngs={"sample": jax.random.key(4)})
    assert np.isfinite(float(out2["itm_task_loss"]))


def test_mim_only_masked_positions_matter():
    task = make_task(["mim"], phase=None)
    batch = make_batch()
    variables = init_task(task, batch)
    out1 = task.apply(variables, batch, rngs={"sample": jax.random.key(2)})

    labels2 = np.asarray(batch["mim_labels"]).copy()
    labels2[:, 2:] = (labels2[:, 2:] + 7) % TINY["img_vocab_size"]  # unmasked only
    out2 = task.apply(
        variables, {**batch, "mim_labels": jnp.asarray(labels2)},
        rngs={"sample": jax.random.key(2)},
    )
    np.testing.assert_allclose(
        float(out1["mim_task_loss"]), float(out2["mim_task_loss"]), rtol=1e-6
    )

    labels3 = np.asarray(batch["mim_labels"]).copy()
    labels3[:, :2] = (labels3[:, :2] + 7) % TINY["img_vocab_size"]  # masked
    out3 = task.apply(
        variables, {**batch, "mim_labels": jnp.asarray(labels3)},
        rngs={"sample": jax.random.key(2)},
    )
    assert abs(float(out1["mim_task_loss"]) - float(out3["mim_task_loss"])) > 1e-6


def test_mim_fusion_head_pos():
    task = make_task(["mim"], phase=None, mim_head_pos="fusion")
    batch = make_batch()
    variables = init_task(task, batch)
    out = task.apply(variables, batch, rngs={"sample": jax.random.key(2)})
    assert np.isfinite(float(out["mim_task_loss"]))


def test_vqa_bce_matches_torch():
    task = make_task(["vqa"], phase="finetune_vqa")
    batch = make_batch()
    variables = init_task(task, batch)
    out = task.apply(variables, batch, rngs={"sample": jax.random.key(2)})

    logits = torch.from_numpy(np.asarray(out["vqa_logits"], np.float32))
    targets = torch.from_numpy(np.asarray(batch["vqa_targets"], np.float32))
    ref = F.binary_cross_entropy_with_logits(logits, targets) * targets.shape[1]
    np.testing.assert_allclose(float(out["vqa_task_loss"]), float(ref), rtol=1e-4)


def test_vqa_rdrop_kl():
    task = make_task(["vqa"], phase="finetune_vqa", kl_alpha=0.5, drop_rate=0.1)
    batch = make_batch()
    variables = init_task(task, batch)
    out = task.apply(
        variables, batch, deterministic=False,
        rngs={
            "sample": jax.random.key(2),
            "dropout": jax.random.key(3),
            "droppath": jax.random.key(4),
        },
    )
    assert "vqa_kl_task_loss" in out
    assert np.isfinite(float(out["vqa_kl_task_loss"]))


def test_nlvr2_two_images():
    task = make_task(["nlvr2"], phase="finetune_nlvr2")
    batch = make_batch(nlvr=True)
    variables = init_task(task, batch)
    out = task.apply(variables, batch, rngs={"sample": jax.random.key(2)})
    assert out["nlvr2_logits"].shape == (4, 2)
    assert np.isfinite(float(out["nlvr2_task_loss"]))

    # answers must matter
    out2 = task.apply(
        variables, {**batch, "answers": 1 - batch["answers"]},
        rngs={"sample": jax.random.key(2)},
    )
    assert abs(float(out["nlvr2_task_loss"]) - float(out2["nlvr2_task_loss"])) > 1e-6


def test_pretrain_mum_all_losses_and_total():
    task = make_task(["mlm", "itc", "itm", "mim"], phase="pretrain_mum")
    batch = make_batch()
    variables = init_task(task, batch)
    out = task.apply(variables, batch, rngs={"sample": jax.random.key(2)})
    for k in ("mlm_task_loss", "itc_task_loss", "itm_task_loss", "mim_task_loss"):
        assert np.isfinite(float(out[k])), k
    total = total_loss(out)
    expected = sum(float(out[k]) for k in out if k.endswith("_task_loss"))
    np.testing.assert_allclose(float(total), expected, rtol=1e-6)


def test_total_loss_filters_nonfinite():
    out = {"a_task_loss": jnp.asarray(1.5), "b_task_loss": jnp.asarray(np.nan),
           "c_metric": jnp.asarray(7.0)}
    np.testing.assert_allclose(float(total_loss(out)), 1.5)


def test_mpp_pipeline_and_loss():
    """MPP: 3x256-way discretized-RGB CE at masked patches, labels from the
    synthetic pipeline (reference compute_mpp, objectives.py:781-813)."""
    from exploremultimodal_tpu.data.datasets import SyntheticDataset

    ds = SyntheticDataset(size=4, img_size=32, second_size=None, max_text_len=8,
                          patch_grid=2, num_mask_patches=2, min_mask_per_block=1,
                          mpp_labels=True)
    s = ds[0]
    assert s["image_labels_mpp"].shape == (4, 3)
    unmasked = s["image_bool_masked_pos"] == 0
    assert (s["image_labels_mpp"][unmasked] == -100).all()

    task = make_task(["mpp"], phase=None)
    batch = make_batch()
    labels = np.full((4, N_PATCH, 3), -100, np.int32)
    bmp = np.asarray(batch["image_bool_masked_pos"])
    labels[bmp == 1] = np.random.default_rng(0).integers(
        0, 256, (int(bmp.sum()), 3))
    batch["image_labels_mpp"] = jnp.asarray(labels)
    variables = init_task(task, batch)
    out = task.apply(variables, batch, rngs={"sample": jax.random.key(2)})
    assert np.isfinite(float(out["mpp_task_loss"]))
    assert int(out["mpp_count"]) == int(bmp.sum()) * 3


def test_itm_dedup_path_matches_naive_fused_forward():
    """The below-fusion dedup restructuring must be bit-equivalent (in
    deterministic mode) to forwarding the full 3*bs pair batch."""
    task = make_task(["itm"], phase=None)
    batch = make_batch()
    variables = init_task(task, batch)

    bs = 4
    rngk = np.random.default_rng(5)
    neg_img_idx = jnp.asarray((np.arange(bs) + 1) % bs)
    neg_txt_idx = jnp.asarray((np.arange(bs) + 2) % bs)
    img, txt, mask = batch["image"], batch["text_ids"], batch["text_mask"]

    def dedup_path(task_mod):
        img_u = jnp.concatenate([img, img[neg_img_idx]], 0)
        txt_u = jnp.concatenate([txt, txt[neg_txt_idx]], 0)
        mask_u = jnp.concatenate([mask, mask[neg_txt_idx]], 0)
        h_img = task_mod.stream_below_fusion(img=img_u)
        h_txt = task_mod.stream_below_fusion(txt=txt_u, txt_mask=mask_u)
        pair_img = jnp.concatenate([h_img[:bs], h_img[bs:], h_img[:bs]], 0)
        pair_txt = jnp.concatenate([h_txt[:bs], h_txt[:bs], h_txt[bs:]], 0)
        pair_mask = jnp.concatenate([mask, mask, mask[neg_txt_idx]], 0)
        co, _ = task_mod.fuse_from_hidden(pair_img, pair_txt, pair_mask)
        return task_mod.itm_logits(task_mod.pool_feats(co))

    def naive_path(task_mod):
        img_all = jnp.concatenate([img, img[neg_img_idx], img], 0)
        txt_all = jnp.concatenate([txt, txt, txt[neg_txt_idx]], 0)
        mask_all = jnp.concatenate([mask, mask, mask[neg_txt_idx]], 0)
        infer = task_mod.infer(
            {"image": img_all, "text_ids": txt_all, "text_mask": mask_all},
            infer_mode="img-txt",
        )
        return task_mod.itm_logits(infer["cls_feats"])

    from exploremultimodal_tpu.models.task import VlmoTask

    logits_dedup = task.apply(variables, method=dedup_path)
    logits_naive = task.apply(variables, method=naive_path)
    np.testing.assert_allclose(
        np.asarray(logits_dedup), np.asarray(logits_naive), rtol=1e-5, atol=1e-6
    )


def test_mae_objective():
    """MAE pixel regression (runnable pretrain_vis intent): masked-only MSE
    on per-patch-normalized targets; patchify matches conv token order."""
    from exploremultimodal_tpu.objectives.losses import patchify

    # patchify ordering: distinct constant per patch survives roundtrip
    img = np.zeros((1, 32, 32, 3), np.float32)
    img[0, :16, :16] = 1.0   # patch 0
    img[0, :16, 16:] = 2.0   # patch 1
    img[0, 16:, :16] = 3.0   # patch 2
    img[0, 16:, 16:] = 4.0   # patch 3
    p = np.asarray(patchify(jnp.asarray(img), 16))
    np.testing.assert_allclose(p.mean(-1)[0], [1.0, 2.0, 3.0, 4.0])

    task = make_task(["mae"], phase=None)
    batch = make_batch()
    variables = init_task(task, batch)
    out = task.apply(variables, batch, rngs={"sample": jax.random.key(2)})
    assert np.isfinite(float(out["mae_task_loss"]))
    assert int(out["mae_count"]) == int(np.asarray(batch["image_bool_masked_pos"]).sum())

    # pixels in UNMASKED patches must not affect the loss
    img2 = np.asarray(batch["image"]).copy()
    bmp = np.asarray(batch["image_bool_masked_pos"])
    img2[:, 16:, 16:] = img2[:, 16:, 16:] + 1.0  # patch 3 (unmasked: bmp[:, :2]=1)
    assert bmp[0, 3] == 0
    out2 = task.apply(
        variables, {**batch, "image": jnp.asarray(img2)},
        rngs={"sample": jax.random.key(2)},
    )
    # NOTE: the encoder sees unmasked patches, so features (and predictions
    # at masked positions) can shift; only check the loss stays finite and
    # the target-side masking via a pure-target perturbation instead:
    targets_only = np.asarray(batch["image"]).copy()
    # changing MASKED patch pixels changes the loss (targets live there)
    targets_only[:, :16, :16] = targets_only[:, :16, :16] * 2.0
    out3 = task.apply(
        variables, {**batch, "image": jnp.asarray(targets_only)},
        rngs={"sample": jax.random.key(2)},
    )
    assert abs(float(out3["mae_task_loss"]) - float(out["mae_task_loss"])) > 1e-8


def test_imgcls_objective():
    task = make_task(["imgcls"], phase=None, num_classes=7)
    batch = make_batch()
    batch["label"] = jnp.asarray(np.random.default_rng(0).integers(0, 7, (4,)))
    variables = init_task(task, batch)
    out = task.apply(variables, batch, rngs={"sample": jax.random.key(2)})
    assert np.isfinite(float(out["imgcls_task_loss"]))
    assert int(out["imgcls_count"]) == 4
    # labels matter
    out2 = task.apply(
        variables, {**batch, "label": (batch["label"] + 1) % 7},
        rngs={"sample": jax.random.key(2)},
    )
    assert abs(float(out["imgcls_task_loss"]) - float(out2["imgcls_task_loss"])) > 1e-8


def test_shared_stream_restructure_bit_equivalent():
    """ITC split at the fusion boundary + MLM/ITM reuse of the below-fusion
    hiddens must be bit-equivalent (deterministic mode) to independent full
    infers per objective (the reference's structure)."""
    task = make_task(["mlm", "itc", "itm"], phase="pretrain_mum")
    batch = make_batch()
    variables = init_task(task, batch)

    # --- ITC features: split path vs full single-stream infer
    def split_feats(m):
        h_img = m.stream_below_fusion(img=batch["image"])
        h_txt = m.stream_below_fusion(
            txt=batch["text_ids"], txt_mask=batch["text_mask"]
        )
        img_feats = m.continue_single_stream(h_img, None, "v")
        txt_feats = m.continue_single_stream(h_txt, batch["text_mask"], "l")
        return (m.itc_project(img_feats[:, 0], "v"),
                m.itc_project(txt_feats[:, 0], "l"))

    def full_feats(m):
        img_infer = m.infer(batch, infer_mode="img_only")
        txt_infer = m.infer(batch, infer_mode="txt_only")
        return (m.itc_project(img_infer["co_feats"][:, 0], "v"),
                m.itc_project(txt_infer["co_feats"][:, 0], "l"))

    i_s, t_s = task.apply(variables, method=split_feats)
    i_f, t_f = task.apply(variables, method=full_feats)
    np.testing.assert_array_equal(np.asarray(i_s), np.asarray(i_f))
    np.testing.assert_array_equal(np.asarray(t_s), np.asarray(t_f))

    # --- MLM via shared image hidden vs direct fused infer
    def shared_mlm(m):
        h_img = m.stream_below_fusion(img=batch["image"])
        h_txt_mlm = m.stream_below_fusion(
            txt=batch["text_ids_mlm"], txt_mask=batch["text_mask"]
        )
        co, _ = m.fuse_from_hidden(h_img, h_txt_mlm, batch["text_mask"])
        return m.mlm_logits(co[:, : m.config.max_text_len])

    def direct_mlm(m):
        infer = m.infer(batch, infer_mode="img-txt", mask_txt=True)
        return m.mlm_logits(infer["txt_feats"])

    np.testing.assert_allclose(
        np.asarray(task.apply(variables, method=shared_mlm)),
        np.asarray(task.apply(variables, method=direct_mlm)),
        rtol=1e-6, atol=1e-6,
    )

    # --- ITM via shared hiddens vs full fused forwards of all 3·bs pairs
    bs = 4
    neg_img_idx = jnp.asarray((np.arange(bs) + 1) % bs)
    neg_txt_idx = jnp.asarray((np.arange(bs) + 3) % bs)
    img, txt, mask = batch["image"], batch["text_ids"], batch["text_mask"]

    def shared_itm(m):
        h_img = m.stream_below_fusion(img=img)
        h_txt = m.stream_below_fusion(txt=txt, txt_mask=mask)
        pair_img = jnp.concatenate([h_img, h_img[neg_img_idx], h_img], 0)
        pair_txt = jnp.concatenate([h_txt, h_txt, h_txt[neg_txt_idx]], 0)
        pair_mask = jnp.concatenate([mask, mask, mask[neg_txt_idx]], 0)
        co, _ = m.fuse_from_hidden(pair_img, pair_txt, pair_mask)
        return m.itm_logits(m.pool_feats(co))

    def naive_itm(m):
        img_all = jnp.concatenate([img, img[neg_img_idx], img], 0)
        txt_all = jnp.concatenate([txt, txt, txt[neg_txt_idx]], 0)
        mask_all = jnp.concatenate([mask, mask, mask[neg_txt_idx]], 0)
        infer = m.infer(
            {"image": img_all, "text_ids": txt_all, "text_mask": mask_all},
            infer_mode="img-txt",
        )
        return m.itm_logits(infer["cls_feats"])

    np.testing.assert_allclose(
        np.asarray(task.apply(variables, method=shared_itm)),
        np.asarray(task.apply(variables, method=naive_itm)),
        rtol=1e-5, atol=1e-6,
    )

    # --- and the assembled __call__ exposes the shared hiddens
    out = task.apply(variables, batch, rngs={"sample": jax.random.key(2)})
    assert "itc_h_img" in out and "itc_h_txt" in out
    for k in ("mlm_task_loss", "itc_task_loss", "itm_task_loss"):
        assert np.isfinite(float(out[k])), k


def test_itm_builder_composition_matches_compute_itm():
    """itm_sample_pairs + fuse_from_hidden + itm_loss_from_co (the split
    building blocks) must compose to exactly compute_itm."""
    from exploremultimodal_tpu.objectives import losses as obj

    task = make_task(["mlm", "itc", "itm"], phase="pretrain_mum")
    batch = make_batch()
    variables = init_task(task, batch)

    def composed(m):
        ret = obj.compute_itc(m, batch, True)
        pair_img, pair_txt, pair_mask, labels = obj.itm_sample_pairs(
            m, batch, ret, deterministic=True
        )
        co, _ = m.fuse_from_hidden(pair_img, pair_txt, pair_mask)
        return obj.itm_loss_from_co(m, co, labels)

    def direct(m):
        ret = obj.compute_itc(m, batch, True)
        return obj.compute_itm(m, batch, ret, deterministic=True)

    a = task.apply(variables, method=composed,
                   rngs={"sample": jax.random.key(5)})
    b = task.apply(variables, method=direct,
                   rngs={"sample": jax.random.key(5)})
    for k in ("itm_task_loss", "itm_mean_acc", "itm_count"):
        np.testing.assert_allclose(float(a[k]), float(b[k]),
                                   rtol=1e-6, atol=1e-7, err_msg=k)


def test_gather_masked_positions_equivalence_and_truncation():
    """Gathered-head CE == full-sequence CE when count <= k; tail dropped
    (in sequence order) beyond k."""
    from exploremultimodal_tpu.objectives.losses import (
        gather_masked_positions,
        masked_cross_entropy,
    )

    rng = np.random.default_rng(0)
    B, L, D, V = 4, 24, 8, 13
    feats = jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
    W = jnp.asarray(rng.normal(size=(D, V)), jnp.float32)
    labels = np.full((B, L), -100)
    for b in range(B):
        pos = rng.choice(L, size=5, replace=False)
        labels[b, pos] = rng.integers(0, V, 5)
    labels = jnp.asarray(labels)
    valid = labels != -100

    full = masked_cross_entropy(feats @ W, labels, valid)

    g_feats, g_labels, g_valid = gather_masked_positions(feats, labels, valid, 8)
    gathered = masked_cross_entropy(g_feats @ W, g_labels, g_valid)

    for a, b in zip(full, gathered):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)

    # truncation: k=3 keeps only the first 3 masked positions per row
    g_feats, g_labels, g_valid = gather_masked_positions(feats, labels, valid, 3)
    assert g_valid.shape == (B, 3) and bool(g_valid.all())
    for b in range(B):
        first3 = np.flatnonzero(np.asarray(valid)[b])[:3]
        np.testing.assert_array_equal(
            np.asarray(g_labels)[b], np.asarray(labels)[b, first3]
        )


def test_mlm_and_mim_gather_cap_matches_full_head():
    """compute_mlm/compute_mim with a gather cap reproduce the cap=1.0
    (reference full-logits) loss exactly, at pretrain shapes."""
    cfg_full = VlmoConfig(
        img_size=32, patch_size=16, embed_dim=16, depth=2, num_heads=2,
        fusion_layer=1, max_text_len=12, vocab_size=50, img_vocab_size=24,
        loss_names=("mlm", "mim"), phase="pretrain_mum",
        drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.0,
        mlm_gather_cap=1.0, mim_gather_cap=1.0,
    )
    cfg_cap = dataclasses.replace(
        cfg_full, mlm_gather_cap=0.5, mim_gather_cap=0.6
    )
    rng = np.random.default_rng(1)
    B, L, P = 2, 12, 4  # 4 patches on the 2x2 grid
    labels = np.full((B, L), -100)
    labels[:, 2:5] = rng.integers(0, 50, (B, 3))
    batch = {
        "image": jnp.asarray(rng.normal(size=(B, 32, 32, 3)), jnp.float32),
        "text_ids": jnp.asarray(rng.integers(0, 50, (B, L))),
        "text_ids_mlm": jnp.asarray(rng.integers(0, 50, (B, L))),
        "text_labels_mlm": jnp.asarray(labels),
        "text_mask": jnp.ones((B, L), jnp.int32),
        "mim_labels": jnp.asarray(rng.integers(0, 24, (B, P))),
        "image_bool_masked_pos": jnp.asarray([[1, 0, 1, 0], [0, 1, 0, 0]]),
    }
    task_full = VlmoTask(cfg_full)
    variables = task_full.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)}, batch
    )
    out_full = task_full.apply(variables, batch)
    out_cap = VlmoTask(cfg_cap).apply(variables, batch)
    for key in ("mlm_task_loss", "mlm_count", "mim_task_loss", "mim_count"):
        np.testing.assert_allclose(
            np.asarray(out_full[key]), np.asarray(out_cap[key]),
            rtol=2e-5, err_msg=key,
        )


def test_gather_cap_overflow_counter():
    """`{mlm,mim}_dropped_positions` counts exactly the masked positions
    beyond the cap (VERDICT r3 ask 7: instrumented, not asserted), is zero
    when everything fits, and flows into the trainer's metric filter."""
    cfg = VlmoConfig(
        img_size=32, patch_size=16, embed_dim=16, depth=2, num_heads=2,
        fusion_layer=1, max_text_len=12, vocab_size=50, img_vocab_size=24,
        loss_names=("mlm", "mim"), phase="pretrain_mum",
        drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.0,
        mlm_gather_cap=0.25, mim_gather_cap=0.5,  # k_mlm=3, k_mim=2
    )
    rng = np.random.default_rng(2)
    B, L, P = 2, 12, 4
    labels = np.full((B, L), -100)
    labels[0, 2:7] = rng.integers(0, 50, 5)   # 5 masked > k=3 → 2 dropped
    labels[1, 1:4] = rng.integers(0, 50, 3)   # 3 masked = k → 0 dropped
    batch = {
        "image": jnp.asarray(rng.normal(size=(B, 32, 32, 3)), jnp.float32),
        "text_ids": jnp.asarray(rng.integers(0, 50, (B, L))),
        "text_ids_mlm": jnp.asarray(rng.integers(0, 50, (B, L))),
        "text_labels_mlm": jnp.asarray(labels),
        "text_mask": jnp.ones((B, L), jnp.int32),
        "mim_labels": jnp.asarray(rng.integers(0, 24, (B, P))),
        # row0: 3 masked patches > k=2 → 1 dropped; row1: 1 → 0 dropped
        "image_bool_masked_pos": jnp.asarray([[1, 1, 1, 0], [0, 1, 0, 0]]),
    }
    task = VlmoTask(cfg)
    variables = task.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)}, batch
    )
    out = task.apply(variables, batch)
    assert float(out["mlm_dropped_positions"]) == 2.0
    assert float(out["mim_dropped_positions"]) == 1.0
    # loss covers exactly k positions per overflowing row
    assert float(out["mlm_count"]) == 3 + 3
    assert float(out["mim_count"]) == 2 + 1

    from exploremultimodal_tpu.train.trainer import _metrics_from_outputs

    kept = _metrics_from_outputs(out)
    assert "mlm_dropped_positions" in kept and "mim_dropped_positions" in kept

    # no overflow → counter present and exactly zero
    labels2 = np.full((B, L), -100)
    labels2[:, 2] = 1
    out2 = task.apply(
        variables, {**batch, "text_labels_mlm": jnp.asarray(labels2)}
    )
    assert float(out2["mlm_dropped_positions"]) == 0.0
