"""Image-text retrieval evaluation: recall@K.

Implements the capability the reference leaves as a stub
(objectives.py:987-989 `compute_irtr_recall: ...`): encode every image and
text in a split with the ITC projection heads, build the full similarity
matrix, and report i2t / t2i recall@{1,5,10}. Runs as a pair of jitted
single-stream encoders over the eval loader — no O(N²) cross-encoder pass.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from exploremultimodal_tpu.models.task import VlmoTask


def encode_split(task: VlmoTask, params: Any, feeder, loader) -> tuple:
    """→ (img_feats (N, D), txt_feats (N, D)) L2-normalized, row-aligned."""

    @jax.jit
    def encode(params, batch):
        img_infer = task.apply({"params": params}, batch, infer_mode="img_only",
                               method=VlmoTask.infer)
        txt_infer = task.apply({"params": params}, batch, infer_mode="txt_only",
                               method=VlmoTask.infer)
        i = task.apply({"params": params}, img_infer["co_feats"][:, 0], "v",
                       method=VlmoTask.itc_project)
        t = task.apply({"params": params}, txt_infer["co_feats"][:, 0], "l",
                       method=VlmoTask.itc_project)
        return i, t

    i_all, t_all = [], []
    for batch in feeder(iter(loader)):
        model_batch = {
            "image": batch.get("image"),
            "text_ids": batch["text_ids"],
            "text_mask": batch["text_mask"],
        }
        if model_batch["image"] is None and "image_u8" in batch:
            from exploremultimodal_tpu.ops.preprocess import normalize_image

            model_batch["image"] = normalize_image(batch["image_u8"])
        i, t = encode(params, model_batch)
        i_all.append(np.asarray(i, np.float32))
        t_all.append(np.asarray(t, np.float32))
    return np.concatenate(i_all), np.concatenate(t_all)


def recall_at_k(
    img_feats: np.ndarray,
    txt_feats: np.ndarray,
    ks: tuple[int, ...] = (1, 5, 10),
) -> dict[str, float]:
    """Diagonal ground truth (row i's image matches row i's text)."""
    sim = img_feats @ txt_feats.T  # (N, N)
    n = sim.shape[0]
    gt = np.arange(n)

    out = {}
    # i2t: rank of the true text for each image
    order_i2t = np.argsort(-sim, axis=1)
    rank_i2t = np.argmax(order_i2t == gt[:, None], axis=1)
    # t2i
    order_t2i = np.argsort(-sim.T, axis=1)
    rank_t2i = np.argmax(order_t2i == gt[:, None], axis=1)
    for k in ks:
        out[f"i2t_recall@{k}"] = float((rank_i2t < k).mean())
        out[f"t2i_recall@{k}"] = float((rank_t2i < k).mean())
    out["recall_mean"] = float(
        np.mean([out[f"i2t_recall@{k}"] for k in ks]
                + [out[f"t2i_recall@{k}"] for k in ks])
    )
    return out


def evaluate_retrieval(trainer, state, loader) -> dict[str, float]:
    if "itc" not in trainer.task.config.loss_names:
        raise ValueError("retrieval recall needs the ITC projection heads")
    img_feats, txt_feats = encode_split(
        trainer.task, state.params, trainer.feeder, loader
    )
    return recall_at_k(img_feats, txt_feats)
