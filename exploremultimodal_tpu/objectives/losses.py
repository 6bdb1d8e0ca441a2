"""Multitask objectives as pure, fixed-shape functions.

Reference parity: models/vlmo/objectives.py. Each compute_* takes the bound
VlmoTask module (the linen instance inside apply), the batch dict, and
returns a dict with `<name>_task_loss` plus metrics — the same contract as
the reference's objective library, reworked for XLA:

  - boolean-index gathers (objectives.py:52-57,569-570) become fixed-shape
    masked cross-entropies with identical loss values
  - ITM hard-negative multinomial sampling (objectives.py:268-278) becomes
    jax.random.categorical over log-weights with a −inf diagonal, on device
  - the GatherLayer global contrastive gather becomes
    parallel.all_gather_with_grad over the `data` mesh axis
  - data-dependent control flow (mim_head_pos, loss gating, R-Drop) resolves
    at trace time from static config
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from exploremultimodal_tpu.parallel import all_gather_with_grad

Batch = dict[str, Any]

ITC_TEMP_MAX = 4.6052  # log(100); objectives.py:83


def _gather_cap(cap: float, length: int) -> int:
    """Static gather width for masked-position heads: ceil(cap·L), ≥ 1."""
    if cap >= 1.0:
        return length
    return max(1, min(length, int(np.ceil(cap * length))))


def masked_cross_entropy(
    logits: jax.Array, labels: jax.Array, valid: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Mean CE / accuracy over `valid` positions (fixed-shape −100-mask
    replacement for the reference's boolean-index gather). Returns
    (loss, mean_acc, count)."""
    valid = valid.astype(jnp.float32)
    count = valid.sum()
    safe_labels = jnp.where(valid > 0, labels, 0).astype(jnp.int32)
    lf = logits.astype(jnp.float32)
    # logsumexp-gather CE instead of log_softmax-gather: identical value
    # (ll = logit[label] - lse) and backward (softmax - onehot), but never
    # MATERIALIZES the (.., V) log-prob tensor — at the 30522-way MLM head
    # that write+read was ~10 ms/step of pure HBM traffic (BENCH.md round 3
    # bert_mlm profile: log_softmax sub/exp fusions). The f32 upcast fuses
    # into the reduction loops.
    lse = jax.nn.logsumexp(lf, axis=-1)
    label_logit = jnp.take_along_axis(
        lf, safe_labels[..., None], axis=-1
    )[..., 0]
    ll = label_logit - lse
    loss = -(ll * valid).sum() / jnp.maximum(count, 1.0)
    preds = jnp.argmax(logits, axis=-1)
    acc = ((preds == safe_labels) * valid).sum() / jnp.maximum(count, 1.0)
    return loss, acc, count


def gather_masked_positions(
    feats: jax.Array, labels: jax.Array, valid: jax.Array, k: int
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fixed-shape gather of up to `k` valid positions per row to the front.

    The vocab-size logits matmul + fp32 log-softmax only matter at masked
    positions; the reference gathers them with boolean indexing
    (objectives.py:52-57), which is shape-dynamic and jit-hostile. Instead a
    stable argsort on ¬valid brings the masked positions (in sequence order)
    to the front and the first `k` are gathered — (B, L, V) logits shrink to
    (B, k, V). Rows with more than `k` masked positions drop the tail from
    the loss; overflow is counted in-graph (`{mlm,mim}_dropped_positions`
    metric) and the caps are derived from measured masking distributions in
    BENCH.md §"Gather-cap sizing" (MIM: generator budget-bounded at 75 ≤ cap
    78, data/masking.py:67-72 — zero drops by construction; MLM: measured
    WWM overshoot distribution on the fixture corpus).
    """
    order = jnp.argsort(~valid, axis=1, stable=True)[:, :k]
    g_feats = jnp.take_along_axis(feats, order[..., None], axis=1)
    g_labels = jnp.take_along_axis(labels, order, axis=1)
    g_valid = jnp.take_along_axis(valid, order, axis=1)
    return g_feats, g_labels, g_valid


def compute_accuracy(logits: jax.Array, labels: jax.Array) -> tuple[jax.Array, jax.Array]:
    """MLM-adapted accuracy with −100 ignore (objectives.py:24-37)."""
    valid = (labels != -100).astype(jnp.float32)
    count = valid.sum()
    preds = jnp.argmax(logits.astype(jnp.float32), axis=-1)
    acc = ((preds == labels) * valid).sum() / jnp.maximum(count, 1.0)
    return acc, count


def compute_vqa_score(logits: jax.Array, targets: jax.Array) -> tuple[jax.Array, jax.Array]:
    """VQAv2 soft score at the argmax answer (objectives.py:12-21)."""
    idx = jnp.argmax(logits.astype(jnp.float32), axis=-1)
    score = jnp.take_along_axis(targets, idx[:, None], axis=-1)[:, 0]
    return score.mean(), jnp.asarray(logits.shape[0], jnp.float32)


# ------------------------------------------------------------------- MLM


def compute_mlm(
    task, batch: Batch, deterministic: bool = True, shared: dict | None = None
) -> dict:
    """Masked-language-modeling CE over masked text positions
    (objectives.py:40-78). Multimodal when an image is present, else txt-only.
    When ITC already ran, its below-fusion image hidden (`shared['itc_h_img']`)
    feeds the fused forward directly — the image stream below the fusion layer
    is independent of the (masked) text, so recomputing it per objective
    (as the reference does) is pure waste."""
    has_img = batch.get("image") is not None
    if has_img and shared is not None and "itc_h_img" in shared:
        h_txt_mlm = task.stream_below_fusion(
            txt=batch["text_ids_mlm"], txt_mask=batch["text_mask"],
            deterministic=deterministic,
        )
        co_feats, _ = task.fuse_from_hidden(
            shared["itc_h_img"], h_txt_mlm, batch["text_mask"],
            deterministic=deterministic,
        )
        txt_feats = co_feats[:, : task.config.max_text_len]
        labels = batch["text_labels_mlm"]
    else:
        infer = task.infer(
            batch,
            infer_mode="img-txt" if has_img else "txt_only",
            mask_txt=True,
            deterministic=deterministic,
        )
        txt_feats = infer["txt_feats"]
        labels = infer["txt_labels"]

    valid = labels != -100
    k = _gather_cap(task.config.mlm_gather_cap, labels.shape[1])
    extra = {}
    if k < labels.shape[1]:
        # in-graph overflow counter: masked positions beyond the cap fall out
        # of the loss; this must stay ~0 in production (BENCH.md cap sizing)
        extra["mlm_dropped_positions"] = (
            jnp.maximum(valid.sum(axis=1) - k, 0).sum().astype(jnp.float32)
        )
        txt_feats, labels, valid = gather_masked_positions(
            txt_feats, labels, valid, k
        )
    logits = task.mlm_logits(txt_feats)
    loss, acc, count = masked_cross_entropy(logits, labels, valid)
    return {
        "mlm_task_loss": loss,
        "mlm_mean_acc": acc,
        "mlm_count": count,
        **extra,
    }


# ------------------------------------------------------------------- ITC


def compute_itc(
    task,
    batch: Batch,
    deterministic: bool = True,
    axis_name: str | None = None,
    momentum_feats: dict | None = None,
    queue: dict | None = None,
    pos_offset: jax.Array | int = 0,
) -> dict:
    """Image-text contrastive loss (objectives.py:81-236).

    Modes (trace-time, from task.config):
      global_reduce — gradient-preserving all-gather of projected features
                      over the data axis, local rows rolled first so positives
                      sit on the diagonal (GatherLayer + torch.roll)
      momentum      — `momentum_feats` carries {'i_feat_m','t_feat_m', and
                      optionally 'i_feat_l_m','t_feat_l_m','t_mask_m'} from
                      the EMA encoder; `queue` carries {'img','txt'} (itc_dim,
                      Q) negative queues (ALBEF-style)
      naive         — in-batch similarities

    Under gradient accumulation the momentum features cover the FULL batch
    while `batch` is one microbatch; `pos_offset` is the microbatch's row
    offset, so positives sit on the offset diagonal and every microbatch
    contrasts against all full-batch negatives — the effective negative count
    is accum-invariant (round-2 verdict: slicing per microbatch shrank the
    pool to bs/accum; equivalence tested in tests/test_momentum_itc.py).
    """
    temp = jnp.exp(jnp.clip(task.itc_temp_value(), 0.0, ITC_TEMP_MAX))

    # single-modality streams split at the fusion boundary: the below-fusion
    # hidden states are returned (itc_h_img/itc_h_txt) so ITM and MLM reuse
    # them instead of recomputing 2·bs streams each (bit-identical to the
    # reference's full infer — blocks[0:f] then blocks[f:] == blocks[0:depth])
    h_img = task.stream_below_fusion(
        img=batch["image"], deterministic=deterministic
    )
    h_txt = task.stream_below_fusion(
        txt=batch["text_ids"], txt_mask=batch["text_mask"],
        deterministic=deterministic,
    )
    img_feats = task.continue_single_stream(
        h_img, None, "v", deterministic=deterministic
    )
    txt_feats = task.continue_single_stream(
        h_txt, batch["text_mask"], "l", deterministic=deterministic
    )

    i_feat = task.itc_project(img_feats[:, 0], "v")
    t_feat = task.itc_project(txt_feats[:, 0], "l")
    i_feat = i_feat.astype(jnp.float32)
    t_feat = t_feat.astype(jnp.float32)

    bs = i_feat.shape[0]
    # positives sit on the plain diagonal except against FULL-BATCH momentum
    # features under accumulation, where this microbatch's rows start at
    # pos_offset (the momentum branch below shifts targets)
    targets = jnp.arange(bs)
    n_pos_cols = bs  # columns holding candidate positives (for the accuracy)
    sim_i2i = sim_t2t = None
    local_g2l = None

    if task.config.global_reduce and axis_name is not None:
        i_feats = all_gather_with_grad(i_feat, axis_name)
        t_feats = all_gather_with_grad(t_feat, axis_name)
        sim_i2t = i_feat @ t_feats.T * temp
        sim_t2i = t_feat @ i_feats.T * temp
    elif momentum_feats is not None:
        i_feat_m = momentum_feats["i_feat_m"].astype(jnp.float32)
        t_feat_m = momentum_feats["t_feat_m"].astype(jnp.float32)
        targets = jnp.arange(bs) + pos_offset
        n_pos_cols = i_feat_m.shape[0]  # full batch, ≥ bs under accumulation
        if queue is not None:
            i_all = jnp.concatenate([i_feat_m.T, queue["img"]], axis=1)
            t_all = jnp.concatenate([t_feat_m.T, queue["txt"]], axis=1)
            sim_i2t = i_feat @ t_all * temp
            sim_t2i = t_feat @ i_all * temp
            sim_i2i = i_feat @ i_all * temp
            sim_t2t = t_feat @ t_all * temp
        else:
            sim_i2t = i_feat @ t_feat_m.T * temp
            sim_t2i = t_feat @ i_feat_m.T * temp
            sim_i2i = i_feat @ i_feat_m.T * temp
            sim_t2t = t_feat @ t_feat_m.T * temp
        if "i_feat_l_m" in momentum_feats:
            t_mask_m = momentum_feats.get("t_mask_m")
            if t_mask_m is None:
                t_mask_m = batch["text_mask"][:, 1:]
            local_g2l = (
                in_batch_g2l_loss(
                    momentum_feats["i_feat_l_m"], i_feat, temp,
                    pos_offset=pos_offset,
                ),
                in_batch_g2l_loss(
                    momentum_feats["t_feat_l_m"], t_feat, temp,
                    t_mask_m, pos_offset=pos_offset,
                ),
            )
    else:
        sim_i2t = i_feat @ t_feat.T * temp
        sim_t2i = sim_i2t.T

    def ce(sim):
        return -jnp.take_along_axis(
            jax.nn.log_softmax(sim, axis=-1), targets[:, None], axis=-1
        ).mean()

    i2t_loss = ce(sim_i2t)
    t2i_loss = ce(sim_t2i)
    losses = [i2t_loss, t2i_loss]

    i2t_acc = (jnp.argmax(sim_i2t[:, :n_pos_cols], -1) == targets).mean()
    t2i_acc = (jnp.argmax(sim_t2i[:, :n_pos_cols], -1) == targets).mean()

    ret = {
        "i2t_Loss": i2t_loss,
        "t2i_Loss": t2i_loss,
        "sim_i2t": sim_i2t,
        "sim_t2i": sim_t2i,
        "itc_temp": temp,
        "itc_i2t_mean_acc": i2t_acc,
        "itc_i2t_count": jnp.asarray(bs, jnp.float32),
        "itc_t2i_mean_acc": t2i_acc,
        "itc_t2i_count": jnp.asarray(bs, jnp.float32),
        "itc_i_feat": i_feat,
        "itc_t_feat": t_feat,
        "itc_h_img": h_img,
        "itc_h_txt": h_txt,
    }

    if sim_i2i is not None:
        i2i_loss = ce(sim_i2i)
        t2t_loss = ce(sim_t2t)
        losses += [i2i_loss, t2t_loss]
        ret.update({"i2i_Loss": i2i_loss, "t2t_Loss": t2t_loss})
        if local_g2l is not None:
            i2i_l, t2t_l = local_g2l
            losses += [i2i_l, t2t_l]
            ret.update({"i2i_l_Loss": i2i_l, "t2t_l_Loss": t2t_l})

    ret["itc_task_loss"] = sum(losses) / len(losses)
    return ret


def patch_pooling(x: jax.Array) -> jax.Array:
    """√N×√N patch grid → (√N//⁴√N)² average pool (objectives.py:468-476:
    F.avg_pool2d(kernel=c1, stride=c1) — floor semantics, so a 14×14 grid
    pools 3×3 windows into 4×4 locals, truncating the last two rows/cols
    exactly as torch does)."""
    bs, length, dim = x.shape
    b1 = int(length**0.5)
    c1 = int(b1**0.5)
    out = b1 // c1
    x = x.reshape(bs, b1, b1, dim)[:, : out * c1, : out * c1]
    x = x.reshape(bs, out, c1, out, c1, dim)
    return x.mean(axis=(2, 4)).reshape(bs, -1, dim)


def in_batch_g2l_loss(l, m, temp, attention_mask=None, pos_offset=0) -> jax.Array:
    """Global-to-local contrast (objectives.py:479-526): each global feature m
    against its own local features (positives) vs all other samples' locals.

    Asymmetric under gradient accumulation: `l` (momentum locals) and
    `attention_mask` cover the FULL batch of N samples while `m` holds the
    microbatch's M ≤ N globals starting at row `pos_offset` — each global
    contrasts against all N·L locals, so the negative pool is accum-invariant.
    With M == N and pos_offset == 0 this is exactly the reference math."""
    l = l.astype(jnp.float32)
    m = m.astype(jnp.float32)
    N, n_locals, dim = l.shape
    M = m.shape[0]
    l_pos = jax.lax.dynamic_slice_in_dim(l, pos_offset, M, axis=0)  # (M, L, d)
    u_p = jnp.einsum("mld,md->ml", l_pos, m)[:, :, None, None] / temp  # (M,L,1,1)
    if attention_mask is not None:
        am_pos = jax.lax.dynamic_slice_in_dim(
            attention_mask, pos_offset, M, axis=0
        )
        am = am_pos[:, :, None, None].astype(jnp.float32)
        u_p = am * u_p + 10000.0 * (1 - am)

    u_n = jnp.einsum("md,nld->mnl", m, l) / temp  # (M, N, L)
    u_n = u_n[:, :, :, None]  # (M, N, L, 1)
    own_row = pos_offset + jnp.arange(M)  # each global's own sample row in l
    n_mask = 1.0 - (own_row[:, None] == jnp.arange(N)[None, :]).astype(
        jnp.float32
    )[:, :, None, None]
    u_n = n_mask * u_n - 10000.0 * (1.0 - n_mask)
    if attention_mask is not None:
        am = attention_mask[None, :, :, None].astype(jnp.float32)
        u_n = am * u_n - 10000.0 * (1 - am)
    u_n = u_n.reshape(M, 1, N * n_locals, 1)
    u_n = jnp.broadcast_to(u_n, (M, n_locals, N * n_locals, 1))

    pred = jnp.concatenate([u_p, u_n], axis=2)  # (M, L, 1+NL, 1)
    logp = jax.nn.log_softmax(pred, axis=2)[:, :, 0, 0]  # positive log-prob
    if attention_mask is not None:
        am = am_pos.astype(jnp.float32)
        return (-(logp * am).sum(1) / am.sum(1)).mean()
    return -logp.mean()


# ------------------------------------------------------------------- ITM


def itm_sample_pairs(
    task,
    batch: Batch,
    sim_dict: dict | None = None,
    rng: jax.Array | None = None,
    deterministic: bool = True,
    pos_offset: jax.Array | int = 0,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """ITC-guided hard-negative sampling + below-fusion pair assembly for ITM
    (objectives.py:239-291). Returns (pair_img, pair_txt, pair_mask, labels)
    for the [pos, img-neg, txt-neg] 3·bs rows, ready for fuse_from_hidden —
    split out so the task can batch these rows with MLM's fused rows.

    Under accumulation with momentum ITC the shared sims have full-batch
    columns; this microbatch's own candidates sit at columns
    [pos_offset, pos_offset+bs), so the hard-negative weights slice there —
    the self-column masked by `eye` is then genuinely the positive."""
    img = batch["image"]
    txt_ids = batch["text_ids"]
    txt_mask = batch["text_mask"]
    bs = img.shape[0]
    if rng is None:
        rng = task.make_rng("sample")
    r_img, r_txt, r1, r2 = jax.random.split(rng, 4)

    if sim_dict is not None:
        def own_cols(sim):
            if sim.shape[1] == bs:  # naive/global branch: already square
                return sim
            return jax.lax.dynamic_slice_in_dim(sim, pos_offset, bs, axis=1)

        logw_i2t = jax.nn.log_softmax(
            jax.lax.stop_gradient(own_cols(sim_dict["sim_i2t"])), axis=1
        )
        logw_t2i = jax.nn.log_softmax(
            jax.lax.stop_gradient(own_cols(sim_dict["sim_t2i"])), axis=1
        )
    else:
        logw_i2t = jax.random.normal(r1, (bs, bs))
        logw_t2i = jax.random.normal(r2, (bs, bs))

    eye = jnp.eye(bs, dtype=bool)
    logw_i2t = jnp.where(eye, -jnp.inf, logw_i2t)
    logw_t2i = jnp.where(eye, -jnp.inf, logw_t2i)

    neg_img_idx = jax.random.categorical(r_img, logw_t2i, axis=1)  # per text
    neg_txt_idx = jax.random.categorical(r_txt, logw_i2t, axis=1)  # per image

    # Dedup below the fusion layer: the pairing [pos, img-neg, txt-neg]
    # reuses each image/text, and single-modality streams below fusion don't
    # depend on the pairing. When ITC ran, its shared below-fusion hiddens
    # cover ALL rows (negatives are in-batch gathers) — ITM then costs zero
    # below-fusion compute; otherwise run 2·bs unique streams. (The reference
    # forwards 3·bs full duplicates, objectives.py:280-291.)
    if sim_dict is not None and "itc_h_img" in sim_dict:
        h_img_all, h_txt_all = sim_dict["itc_h_img"], sim_dict["itc_h_txt"]
        pair_img = jnp.concatenate(
            [h_img_all, h_img_all[neg_img_idx], h_img_all], axis=0
        )
        pair_txt = jnp.concatenate(
            [h_txt_all, h_txt_all, h_txt_all[neg_txt_idx]], axis=0
        )
    else:
        img_unique = jnp.concatenate([img, img[neg_img_idx]], axis=0)
        txt_unique = jnp.concatenate([txt_ids, txt_ids[neg_txt_idx]], axis=0)
        mask_unique = jnp.concatenate([txt_mask, txt_mask[neg_txt_idx]], axis=0)
        h_img = task.stream_below_fusion(
            img=img_unique, deterministic=deterministic
        )
        h_txt = task.stream_below_fusion(
            txt=txt_unique, txt_mask=mask_unique, deterministic=deterministic
        )
        pair_img = jnp.concatenate([h_img[:bs], h_img[bs:], h_img[:bs]], axis=0)
        pair_txt = jnp.concatenate([h_txt[:bs], h_txt[:bs], h_txt[bs:]], axis=0)
    pair_mask = jnp.concatenate(
        [txt_mask, txt_mask, txt_mask[neg_txt_idx]], axis=0
    )
    labels = jnp.concatenate(
        [jnp.ones(bs, jnp.int32), jnp.zeros(2 * bs, jnp.int32)]
    )
    return pair_img, pair_txt, pair_mask, labels


def itm_loss_from_co(task, co_feats: jax.Array, labels: jax.Array) -> dict:
    """ITM head + CE on already-fused pair rows (objectives.py:292-314)."""
    cls_feats = task.pool_feats(co_feats)
    logits = task.itm_logits(cls_feats)
    loss, acc, count = masked_cross_entropy(
        logits, labels, jnp.ones_like(labels)
    )
    return {
        "itm_task_loss": loss,
        "itm_mean_acc": acc,
        "itm_count": count,
    }


def compute_itm(
    task,
    batch: Batch,
    sim_dict: dict | None = None,
    rng: jax.Array | None = None,
    deterministic: bool = True,
    pos_offset: jax.Array | int = 0,
) -> dict:
    """Image-text matching with ITC-guided hard negatives
    (objectives.py:239-314). One fused forward over [pos, img-neg, txt-neg]
    pairs (3·bs rows — same math as the reference's two forwards, one
    launch)."""
    pair_img, pair_txt, pair_mask, labels = itm_sample_pairs(
        task, batch, sim_dict, rng, deterministic, pos_offset
    )
    co_feats, _ = task.fuse_from_hidden(
        pair_img, pair_txt, pair_mask, deterministic=deterministic
    )
    return itm_loss_from_co(task, co_feats, labels)


# ------------------------------------------------------------------- MIM


def compute_mim(task, batch: Batch, deterministic: bool = True) -> dict:
    """Masked-image-modeling CE against frozen dVAE codes
    (objectives.py:532-592). `batch['mim_labels']` carries the token ids
    (computed outside the jitted loss by the frozen tokenizer)."""
    labels = batch["mim_labels"]  # (B, num_patches)
    bool_masked = batch["image_bool_masked_pos"].astype(jnp.float32)

    head_pos = task.config.mim_head_pos
    if head_pos == "img":
        infer = task.infer(
            batch, infer_mode="img_only", mask_img=True,
            deterministic=deterministic,
        )
        img_feats = infer["img_feats"]
    elif head_pos == "mum":
        infer = task.infer(
            batch, infer_mode="img-txt", mask_img=True,
            deterministic=deterministic,
        )
        img_feats = infer["img_feats"]
    elif head_pos == "fusion":
        img_feats = task.backbone_interval_img(
            batch["image"],
            batch["image_bool_masked_pos"],
            out_layer=task.config.fusion_layer,
            deterministic=deterministic,
        )
    else:
        raise ValueError(f"mim_head_pos {head_pos!r}")

    patch_feats = img_feats[:, 1:]  # drop CLS
    valid = bool_masked > 0
    k = _gather_cap(task.config.mim_gather_cap, labels.shape[1])
    extra = {}
    if k < labels.shape[1]:
        extra["mim_dropped_positions"] = (
            jnp.maximum(valid.sum(axis=1) - k, 0).sum().astype(jnp.float32)
        )
        patch_feats, labels, valid = gather_masked_positions(
            patch_feats, labels, valid, k
        )
    logits = task.mim_logits(patch_feats)
    loss, acc, count = masked_cross_entropy(logits, labels, valid)
    return {
        "mim_task_loss": loss,
        "mim_mean_acc": acc,
        "mim_count": count,
        **extra,
    }


# ------------------------------------------------------------------- VQA


def _bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    logits = logits.astype(jnp.float32)
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def compute_vqa(
    task,
    batch: Batch,
    deterministic: bool = True,
    isda_state=None,
    isda_ratio: float = 0.0,
) -> dict:
    """VQAv2 BCE over 3129 soft targets (objectives.py:317-389), with optional
    ISDA logit augmentation and R-Drop symmetric KL (kl_alpha > 0)."""
    infer = task.infer(batch, infer_mode="img-txt", deterministic=deterministic)
    use_isda = isda_state is not None
    logits, hidden = task.vqa_logits(infer["cls_feats"], return_hidden=True)
    targets = batch["vqa_targets"].astype(jnp.float32)
    num_answers = targets.shape[1]

    ret = {"vqa_logits": logits, "vqa_count": jnp.asarray(logits.shape[0], jnp.float32)}
    new_isda_state = isda_state

    train_logits = logits
    if use_isda and not deterministic:
        from exploremultimodal_tpu.models import heads as H

        onehot = (targets > 0).astype(jnp.float32)
        new_isda_state = H.isda_update(isda_state, hidden, onehot)
        labels = jnp.argmax(targets, axis=1)
        train_logits = H.isda_logits(
            logits, hidden, task.vqa_last_kernel(), labels,
            jax.lax.stop_gradient(new_isda_state.cov), isda_ratio,
        )

    vqa_loss = _bce_with_logits(train_logits, targets).mean() * num_answers
    score, count = compute_vqa_score(logits, targets)
    ret.update({
        "vqa_task_loss": vqa_loss,
        "vqa_mean_score": score,
        "vqa_count": count,
        "isda_state": new_isda_state,
    })

    kl_alpha = task.config.kl_alpha
    if kl_alpha > 0 and not deterministic:
        infer2 = task.infer(batch, infer_mode="img-txt", deterministic=False)
        logits2 = task.vqa_logits(infer2["cls_feats"])
        loss2 = _bce_with_logits(logits2, targets).mean() * num_answers
        vqa_loss = (vqa_loss + loss2) / 2.0

        p = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        q = jax.nn.log_softmax(logits2.astype(jnp.float32), -1)
        kl = (jnp.exp(q) * (q - p)).sum()
        r_kl = (jnp.exp(p) * (p - q)).sum()
        kl_loss = (kl + r_kl) / 4.0 * kl_alpha
        ret.update({"vqa_task_loss": vqa_loss, "vqa_kl_task_loss": kl_loss})

    return ret


# ------------------------------------------------------------------ NLVR2


def compute_nlvr2(task, batch: Batch, deterministic: bool = True) -> dict:
    """Two fused forwards with image token types 1/2, concat CLS, 2-way CE
    (objectives.py:885-943)."""
    infer1 = task.infer(
        batch, infer_mode="img-txt", image_token_type_idx=1,
        deterministic=deterministic,
    )
    infer2 = task.infer(
        batch, infer_mode="img-txt", image_token_type_idx=2,
        deterministic=deterministic,
    )
    cls = jnp.concatenate([infer1["cls_feats"], infer2["cls_feats"]], axis=-1)
    logits = task.nlvr2_logits(cls)
    labels = batch["answers"].astype(jnp.int32)
    loss, acc, count = masked_cross_entropy(logits, labels, jnp.ones_like(labels))
    return {
        "nlvr2_task_loss": loss,
        "nlvr2_logits": logits,
        "nlvr2_mean_acc": acc,
        "nlvr2_count": count,
    }


# ------------------------------------------------------------------- MPP


def compute_mpp(task, batch: Batch, deterministic: bool = True) -> dict:
    """Masked-patch prediction: 3×256-way discretized-RGB CE on masked patches
    (objectives.py:781-813). Labels (B, P, 3) with −100 ignore."""
    infer = task.infer(
        batch, infer_mode="img-txt", mask_img=True, deterministic=deterministic
    )
    logits = task.mpp_logits(infer["img_feats"][:, 1:])  # (B, P, 768)
    B, P, _ = logits.shape
    logits = logits.reshape(B, P, 3, 256)
    labels = batch["image_labels_mpp"]  # (B, P, 3)
    valid = labels != -100
    loss, acc, count = masked_cross_entropy(logits, labels, valid)
    return {"mpp_task_loss": loss, "mpp_mean_acc": acc, "mpp_count": count}


# ------------------------------------------------------------------- MAE


def patchify(images: jax.Array, patch_size: int) -> jax.Array:
    """(B, H, W, C) → (B, num_patches, patch_size²·C), row-major patches
    matching the patch-embedding conv's token order."""
    B, H, W, C = images.shape
    gh, gw = H // patch_size, W // patch_size
    x = images.reshape(B, gh, patch_size, gw, patch_size, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, gh * gw, patch_size * patch_size * C)


def compute_mae(task, batch: Batch, deterministic: bool = True) -> dict:
    """MAE-style masked pixel regression: per-patch-normalized pixel targets,
    MSE on masked patches only. The reference's pretrain_vis driver intends
    exactly this (train/pretrain/visual.py:199-232: per-patch mean/var
    normalize + masked MSE) but its loader is a stub; here it is a runnable
    objective (loss name 'mae')."""
    infer = task.infer(
        batch, infer_mode="img_only", mask_img=True, deterministic=deterministic
    )
    patch_feats = infer["img_feats"][:, 1:]
    pred = task.mae_logits(patch_feats)  # (B, P, patch²·3)

    targets = patchify(
        batch["image"].astype(jnp.float32), task.config.patch_size
    )
    mean = targets.mean(axis=-1, keepdims=True)
    var = targets.var(axis=-1, keepdims=True)
    targets = (targets - mean) / jnp.sqrt(var + 1e-6)

    mask = batch["image_bool_masked_pos"].astype(jnp.float32)  # (B, P)
    per_patch = ((pred.astype(jnp.float32) - targets) ** 2).mean(axis=-1)
    count = mask.sum()
    loss = (per_patch * mask).sum() / jnp.maximum(count, 1.0)
    return {
        "mae_task_loss": loss,
        "mae_count": count,
    }


# ---------------------------------------------------------------- IMGCLS


def compute_imgcls(task, batch: Batch, deterministic: bool = True) -> dict:
    """Image classification over pooled features (compute_imgcls,
    objectives.py:862-882 — written against a legacy interface there; runnable
    here for the finetune_vis surface). Vision-only batches (imgcls arrow
    datasets carry no captions) classify the image stream's pooled CLS."""
    mode = "img-txt" if batch.get("text_ids") is not None else "img_only"
    infer = task.infer(batch, infer_mode=mode, deterministic=deterministic)
    logits = task.imgcls_logits(infer["cls_feats"])
    labels = batch["label"].astype(jnp.int32)
    loss, acc, count = masked_cross_entropy(logits, labels, jnp.ones_like(labels))
    return {
        "imgcls_task_loss": loss,
        "imgcls_mean_acc": acc,
        "imgcls_count": count,
    }


# --------------------------------------------------------------- REFCOCO


def _cxcywh_to_xyxy(b: jax.Array) -> jax.Array:
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1
    )


def box_iou_giou(a: jax.Array, b: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-row (IoU, GIoU) of xyxy boxes a, b of shape (..., 4)."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    inter = jnp.prod(jnp.clip(rb - lt, 0.0), axis=-1)
    area = lambda x: jnp.prod(jnp.clip(x[..., 2:] - x[..., :2], 0.0), axis=-1)
    union = area(a) + area(b) - inter
    iou = inter / jnp.maximum(union, 1e-6)
    # GIoU: subtract the empty fraction of the tightest enclosing box
    elt = jnp.minimum(a[..., :2], b[..., :2])
    erb = jnp.maximum(a[..., 2:], b[..., 2:])
    enclose = jnp.prod(jnp.clip(erb - elt, 0.0), axis=-1)
    giou = iou - (enclose - union) / jnp.maximum(enclose, 1e-6)
    return iou, giou


def compute_refcoco(task, batch: Batch, deterministic: bool = True) -> dict:
    """Referring-expression grounding: the fused image+expression CLS
    regresses one normalized (cx, cy, w, h) box (RefHead); loss is the
    DETR-family box recipe 5·L1 + 2·(1−GIoU); metrics are mean IoU and
    acc@IoU≥0.5 (the standard RefCOCO precision metric). The reference
    reserves the head slot and ships a log-only driver
    (vlmo_module.py:117-118, train/finetune/ref.py) — runnable here."""
    infer = task.infer(batch, infer_mode="img-txt",
                       deterministic=deterministic)
    pred = task.ref_box(infer["cls_feats"])  # (B, 4) in [0, 1] cxcywh
    target = batch["ref_box"].astype(jnp.float32)
    l1 = jnp.abs(pred - target).sum(axis=-1)
    iou, giou = box_iou_giou(_cxcywh_to_xyxy(pred), _cxcywh_to_xyxy(target))
    loss = (5.0 * l1 + 2.0 * (1.0 - giou)).mean()
    return {
        "refcoco_task_loss": loss,
        "refcoco_mean_acc": (iou >= 0.5).astype(jnp.float32).mean(),
        "refcoco_mean_score": iou.mean(),
        "refcoco_count": jnp.asarray(pred.shape[0], jnp.float32),
    }


# ------------------------------------------------------------------ IRTR


def compute_irtr(task, batch: Batch, deterministic: bool = True) -> dict:
    """In-batch text-retrieval ranking over drawn false texts
    (objectives.py:946-984): score true + F false (image, text) pairs, CE
    with the true pair at index 0."""
    img = batch["image"]
    false_ids = batch["false_text_ids"]  # (B, F, L)
    false_mask = batch["false_text_mask"]
    B, F_, L = false_ids.shape

    ids = jnp.concatenate([batch["text_ids"][:, None], false_ids], axis=1)
    mask = jnp.concatenate([batch["text_mask"][:, None], false_mask], axis=1)
    imgs = jnp.broadcast_to(img[:, None], (B, F_ + 1) + img.shape[1:])

    flat = {
        "image": imgs.reshape((B * (F_ + 1),) + img.shape[1:]),
        "text_ids": ids.reshape(B * (F_ + 1), L),
        "text_mask": mask.reshape(B * (F_ + 1), L),
    }
    infer = task.infer(flat, infer_mode="img-txt", deterministic=deterministic)
    score = task.rank_logits(infer["cls_feats"])[:, 0].reshape(B, F_ + 1)
    labels = jnp.zeros((B,), jnp.int32)
    loss, acc, count = masked_cross_entropy(score, labels, jnp.ones_like(labels))
    return {"irtr_task_loss": loss, "irtr_mean_acc": acc, "irtr_count": count}
