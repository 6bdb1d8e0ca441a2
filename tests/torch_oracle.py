"""Functional PyTorch oracle of the VLMo forward semantics, for parity tests.

This is an independent, test-only implementation of the reference math
(documented in SURVEY.md §2.2/§3.3): shared attention with q/v bias + zero k
bias, −inf key-padding mask, routed FFN experts, LayerScale, BEiT mask-token
substitution, BERT text embeddings (LN eps 1e-12) + shared token-type
embeddings, dual-stream → fused forward. It consumes a flat weight dict
exported from the Flax parameter tree (see `export_backbone_weights`), so a
single set of random weights drives both implementations and the outputs are
compared to fp32 tolerance — the BASELINE.json "VLMo logits within fp32
tolerance" requirement, checked without any reference checkpoint.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F


def export_backbone_weights(params) -> dict[str, torch.Tensor]:
    """Flax VLMO param tree → flat torch dict (transposing Dense/Conv kernels)."""
    import jax

    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = ".".join(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        arr = np.asarray(leaf)
        t = torch.from_numpy(arr.copy())
        if name.endswith("kernel"):
            if t.ndim == 2:  # dense: (in, out) → (out, in)
                t = t.T.contiguous()
            elif t.ndim == 4:  # conv: (kh, kw, in, out) → (out, in, kh, kw)
                t = t.permute(3, 2, 0, 1).contiguous()
        flat[name] = t
    return flat


def _ln(x, w, prefix, eps=1e-12):
    return F.layer_norm(
        x, (x.shape[-1],), w[f"{prefix}.scale"], w[f"{prefix}.bias"], eps=eps
    )


def _dense(x, w, prefix):
    return F.linear(x, w[f"{prefix}.kernel"], w.get(f"{prefix}.bias"))


def _attention(x, w, prefix, num_heads, mask):
    B, N, C = x.shape
    q_bias = w[f"{prefix}.q_bias"]
    v_bias = w[f"{prefix}.v_bias"]
    qkv_bias = torch.cat([q_bias, torch.zeros_like(q_bias), v_bias])
    qkv = F.linear(x, w[f"{prefix}.qkv.kernel"], qkv_bias)
    qkv = qkv.reshape(B, N, 3, num_heads, C // num_heads).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    scores = (q @ k.transpose(-2, -1)) * (C // num_heads) ** -0.5
    if mask is not None:
        scores = scores.masked_fill(~mask.bool()[:, None, None, :], float("-inf"))
    probs = scores.softmax(dim=-1)
    out = (probs @ v).transpose(1, 2).reshape(B, N, C)
    return _dense(out, w, f"{prefix}.proj")


def _mlp(x, w, prefix):
    h = F.gelu(_dense(x, w, f"{prefix}.fc1"))
    return _dense(h, w, f"{prefix}.fc2")


def _block(x, w, prefix, num_heads, mask, route):
    attn_out = _attention(_ln(x, w, f"{prefix}.norm1"), w, f"{prefix}.attn",
                          num_heads, mask)
    g1 = w.get(f"{prefix}.gamma_1")
    g2 = w.get(f"{prefix}.gamma_2")
    x = x + (attn_out if g1 is None else g1 * attn_out)
    mlp_out = _mlp(_ln(x, w, f"{prefix}.norm2"), w, f"{prefix}.mlp_{route}")
    return x + (mlp_out if g2 is None else g2 * mlp_out)


def embed_img(img_nchw, w, bool_masked_pos=None, token_type_idx=1):
    x = F.conv2d(
        img_nchw, w["patch_embed.kernel"], w["patch_embed.bias"],
        stride=w["patch_embed.kernel"].shape[-1],
    )
    B, C = x.shape[0], x.shape[1]
    x = x.flatten(2).transpose(1, 2)  # (B, P, C)
    if bool_masked_pos is not None:
        m = bool_masked_pos.unsqueeze(-1).to(x.dtype)
        x = x * (1 - m) + w["img_mask_token"][0] * m
    cls = w["img_cls_token"].expand(B, -1, -1)
    x = torch.cat([cls, x], dim=1)
    x = x + w["pos_embed"]
    tt = w["token_type_embeddings.embedding"][token_type_idx]
    return x + tt


def embed_txt(ids, w):
    e = w["txt_embeddings.word_embeddings.embedding"][ids]
    pos = w["txt_embeddings.position_embeddings.embedding"][: ids.shape[1]]
    bert_tt = w["txt_embeddings.token_type_embeddings.embedding"][0]
    x = _ln(e + pos + bert_tt, w, "txt_embeddings.LayerNorm")
    return x + w["token_type_embeddings.embedding"][0]


def forward_features(
    w,
    depth,
    num_heads,
    fusion_layer,
    img=None,
    txt=None,
    txt_mask=None,
    bool_masked_pos=None,
    token_type_idx=1,
):
    """Returns (features, mask) exactly like VLMO.forward_features."""
    if img is not None:
        B = img.shape[0]
        n_patches = (img.shape[-1] // w["patch_embed.kernel"].shape[-1]) ** 2
        img_mask = torch.ones(B, n_patches + 1, dtype=torch.int64)

    if txt is None:
        x = embed_img(img, w, bool_masked_pos, token_type_idx)
        for i in range(depth):
            x = _block(x, w, f"blocks_{i}", num_heads, img_mask, "v")
        return _ln(x, w, "norm"), img_mask

    if img is None:
        x = embed_txt(txt, w)
        for i in range(depth):
            x = _block(x, w, f"blocks_{i}", num_heads, txt_mask, "l")
        return _ln(x, w, "norm"), txt_mask

    xi = embed_img(img, w, bool_masked_pos, token_type_idx)
    xt = embed_txt(txt, w)
    for i in range(fusion_layer):
        xi = _block(xi, w, f"blocks_{i}", num_heads, img_mask, "v")
        xt = _block(xt, w, f"blocks_{i}", num_heads, txt_mask, "l")
    co = torch.cat([xt, xi], dim=1)
    co_mask = torch.cat([txt_mask, img_mask], dim=1)
    for i in range(fusion_layer, depth):
        co = _block(co, w, f"blocks_{i}", num_heads, co_mask, "vl")
    return _ln(co, w, "norm"), co_mask


def pool(feats, w):
    return torch.tanh(_dense(feats[:, 0], w, "pooler.dense"))


def mlm_logits(feats, w):
    h = _dense(feats, w, "transform_dense")
    h = F.gelu(h)
    h = _ln(h, w, "transform_ln")
    emb = w["txt_embeddings.word_embeddings.embedding"]
    return h @ emb.T + w["head.bias"]
