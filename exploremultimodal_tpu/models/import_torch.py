"""PyTorch checkpoint importers: VLMo and BEiT state dicts → flax param tree.

Reference parity: vlmo_module.py:187-319 —
  load_from_ckpt   auto-detects BEiT format (no `.mlp.v/.l/.vl` keys)
  _load_beit       `.mlp.` → vision expert, cls_token → img_cls_token,
                   mask_token → img_mask_token, lm_head → MIM fc
  _load_vlmo       legacy `.mlp.{v,l,vl}_mlp` renames
  interpolate_pos_embedding   bicubic 2-D grid resize on resolution change +
                   text position-embedding truncation

Tensor layout transforms at the boundary: torch Linear (out,in) → flax kernel
(in,out); torch Conv (O,I,kh,kw) → flax (kh,kw,I,O); LayerNorm weight → scale.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _to_np(v) -> np.ndarray:
    return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)


def _set(tree: dict, path: list[str], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = jnp.asarray(value)


def detect_beit(state: dict) -> bool:
    return not any(
        ".mlp.v" in k or ".mlp.l" in k or ".mlp.vl" in k for k in state
    )


def normalize_legacy_names(state: dict) -> dict:
    """`.mlp.{v,l,vl}_mlp` → `.mlp.{v,l,vl}` (vlmo_module.py:237-249)."""
    out = {}
    for k, v in state.items():
        for old, new in ((".mlp.v_mlp", ".mlp.v"), (".mlp.l_mlp", ".mlp.l"),
                         (".mlp.vl_mlp", ".mlp.vl")):
            if old in k:
                k = k.replace(old, new)
        out[k] = v
    return out


def beit_to_vlmo_names(state: dict) -> dict:
    """BEiT key remap (vlmo_module.py:265-299)."""
    out = {}
    for k, v in state.items():
        if ".mlp." in k:
            k = k.replace(".mlp.", ".mlp.v.")
        if "cls_token" in k and "img_cls_token" not in k:
            k = k.replace("cls_token", "img_cls_token")
        if "mask_token" in k and "img_mask_token" not in k:
            k = k.replace("mask_token", "img_mask_token")
        if "lm_head" in k:
            k = k.replace("lm_head", "mim_head.fc")
        out[k] = v
    return out


def interpolate_pos_embed(
    pos: np.ndarray, target_len: int
) -> np.ndarray:
    """Bicubic 2-D interpolation of the patch grid, CLS row kept
    (vlmo_module.py:187-221)."""
    if pos.shape[1] == target_len:
        return pos
    n_extra = 1  # [CLS]
    orig = int(round((pos.shape[1] - n_extra) ** 0.5))
    new = int(round((target_len - n_extra) ** 0.5))
    extra = pos[:, :n_extra]
    grid = pos[:, n_extra:].reshape(1, orig, orig, -1)
    resized = jax.image.resize(
        jnp.asarray(grid), (1, new, new, grid.shape[-1]), method="bicubic"
    )
    return np.concatenate(
        [extra, np.asarray(resized).reshape(1, new * new, -1)], axis=1
    )


def import_torch_state(
    state: dict,
    target_params: Any,
    *,
    max_text_len: int | None = None,
) -> tuple[Any, list[str], list[str]]:
    """Map a torch state dict onto a copy of `target_params`.

    Returns (new_params, loaded_keys, missing_paths). Unknown torch keys are
    skipped (reference uses strict=False); target leaves without a source
    keep their initialization.
    """
    state = {k: _to_np(v) for k, v in normalize_legacy_names(state).items()}
    if detect_beit(state):
        state = beit_to_vlmo_names(state)

    # strip a leading 'module.' (DDP) and unify the backbone prefix
    state = {k.removeprefix("module."): v for k, v in state.items()}

    # pos-embed interpolation + text-pos truncation before mapping
    flat_target = {
        "/".join(str(getattr(p, "key", p)) for p in path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(target_params)[0]
    }
    pe_key = next(
        (k for k in ("transformer.pos_embed", "pos_embed") if k in state), None
    )
    if pe_key and "transformer/pos_embed" in flat_target:
        state[pe_key] = interpolate_pos_embed(
            state[pe_key], flat_target["transformer/pos_embed"].shape[1]
        )
    tpe = "transformer.txt_embeddings.position_embeddings.weight"
    if tpe in state and max_text_len:
        state[tpe] = state[tpe][:max_text_len]
    state.pop("transformer.txt_embeddings.position_ids", None)

    new_params = jax.tree_util.tree_map(lambda x: x, target_params)
    loaded: list[str] = []

    def try_put(torch_key: str, arr: np.ndarray) -> bool:
        path = _map_name(torch_key)
        if path is None:
            return False
        node = new_params
        for p in path[:-1]:
            if not isinstance(node, dict) or p not in node:
                return False
            node = node[p]
        leaf = path[-1]
        if not isinstance(node, dict) or leaf not in node:
            return False
        target = node[leaf]
        arr = _transform(torch_key, arr)
        if tuple(arr.shape) != tuple(target.shape):
            return False
        node[leaf] = jnp.asarray(arr, target.dtype)
        return True

    for k, v in state.items():
        if try_put(k, v):
            loaded.append(k)

    flat_new = {
        "/".join(str(getattr(p, "key", p)) for p in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(new_params)[0]
    }
    loaded_paths = {"/".join(map(str, _map_name(k))) for k in loaded}
    missing = sorted(flat_new - loaded_paths)
    return new_params, loaded, missing


def _transform(torch_key: str, arr: np.ndarray) -> np.ndarray:
    if torch_key.endswith(".weight"):
        if arr.ndim == 4:  # conv
            return np.transpose(arr, (2, 3, 1, 0))
        if arr.ndim == 2 and "embed" not in torch_key.split(".")[-2] and \
                "embeddings" not in torch_key:
            return arr.T  # linear
    return arr


# torch name → flax path mapping table ------------------------------------

_BLOCK_LEAF = {
    "norm1.weight": ("norm1", "scale"),
    "norm1.bias": ("norm1", "bias"),
    "norm2.weight": ("norm2", "scale"),
    "norm2.bias": ("norm2", "bias"),
    "attn.qkv.weight": ("attn", "qkv", "kernel"),
    "attn.q_bias": ("attn", "q_bias"),
    "attn.v_bias": ("attn", "v_bias"),
    "attn.proj.weight": ("attn", "proj", "kernel"),
    "attn.proj.bias": ("attn", "proj", "bias"),
    "gamma_1": ("gamma_1",),
    "gamma_2": ("gamma_2",),
}

_TOP = {
    "transformer.pos_embed": ("transformer", "pos_embed"),
    "transformer.img_cls_token": ("transformer", "img_cls_token"),
    "transformer.img_mask_token": ("transformer", "img_mask_token"),
    "transformer.patch_embed.proj.weight": ("transformer", "patch_embed", "kernel"),
    "transformer.patch_embed.proj.bias": ("transformer", "patch_embed", "bias"),
    "transformer.token_type_embeddings.weight": (
        "transformer", "token_type_embeddings", "embedding"),
    "transformer.nlvr2_embedding.weight": (
        "transformer", "token_type_embeddings", "embedding"),
    "transformer.txt_embeddings.word_embeddings.weight": (
        "transformer", "txt_embeddings", "word_embeddings", "embedding"),
    "transformer.txt_embeddings.position_embeddings.weight": (
        "transformer", "txt_embeddings", "position_embeddings", "embedding"),
    "transformer.txt_embeddings.token_type_embeddings.weight": (
        "transformer", "txt_embeddings", "token_type_embeddings", "embedding"),
    "transformer.txt_embeddings.LayerNorm.weight": (
        "transformer", "txt_embeddings", "LayerNorm", "scale"),
    "transformer.txt_embeddings.LayerNorm.bias": (
        "transformer", "txt_embeddings", "LayerNorm", "bias"),
    "transformer.norm.weight": ("transformer", "norm", "scale"),
    "transformer.norm.bias": ("transformer", "norm", "bias"),
    "transformer.pooler.dense.weight": ("transformer", "pooler", "dense", "kernel"),
    "transformer.pooler.dense.bias": ("transformer", "pooler", "dense", "bias"),
    "mlm_head.transform.dense.weight": ("mlm_head", "transform_dense", "kernel"),
    "mlm_head.transform.dense.bias": ("mlm_head", "transform_dense", "bias"),
    "mlm_head.transform.LayerNorm.weight": ("mlm_head", "transform_ln", "scale"),
    "mlm_head.transform.LayerNorm.bias": ("mlm_head", "transform_ln", "bias"),
    "mlm_head.bias": ("mlm_head", "bias"),
    "itc_temp": ("itc_temp",),
    "itc_head.dense.v.weight": ("itc_head", "dense_v", "kernel"),
    "itc_head.dense.v.bias": ("itc_head", "dense_v", "bias"),
    "itc_head.dense.l.weight": ("itc_head", "dense_l", "kernel"),
    "itc_head.dense.l.bias": ("itc_head", "dense_l", "bias"),
    "itm_head.fc.weight": ("itm_head", "fc", "kernel"),
    "itm_head.fc.bias": ("itm_head", "fc", "bias"),
    "mim_head.fc.weight": ("mim_head", "fc", "kernel"),
    "mim_head.fc.bias": ("mim_head", "fc", "bias"),
    "rank_output.weight": ("rank_output", "fc", "kernel"),
    "rank_output.bias": ("rank_output", "fc", "bias"),
    "vqa_classifier.0.weight": ("vqa_classifier", "fc1", "kernel"),
    "vqa_classifier.0.bias": ("vqa_classifier", "fc1", "bias"),
    "vqa_classifier.1.weight": ("vqa_classifier", "ln", "scale"),
    "vqa_classifier.1.bias": ("vqa_classifier", "ln", "bias"),
    "vqa_classifier.3.weight": ("vqa_classifier", "fc2", "kernel"),
    "vqa_classifier.3.bias": ("vqa_classifier", "fc2", "bias"),
    "nlvr2_classifier.0.weight": ("nlvr2_classifier", "fc1", "kernel"),
    "nlvr2_classifier.0.bias": ("nlvr2_classifier", "fc1", "bias"),
    "nlvr2_classifier.1.weight": ("nlvr2_classifier", "ln", "scale"),
    "nlvr2_classifier.1.bias": ("nlvr2_classifier", "ln", "bias"),
    "nlvr2_classifier.3.weight": ("nlvr2_classifier", "fc2", "kernel"),
    "nlvr2_classifier.3.bias": ("nlvr2_classifier", "fc2", "bias"),
}


def _map_name(torch_key: str) -> tuple | None:
    # BEiT checkpoints use unprefixed backbone names
    key = torch_key
    if key in _TOP:
        return _TOP[key]
    if "transformer." + key in _TOP:
        return _TOP["transformer." + key]

    for prefix in ("transformer.blocks.", "blocks."):
        if key.startswith(prefix):
            rest = key[len(prefix):]
            idx, _, leaf = rest.partition(".")
            if leaf in _BLOCK_LEAF:
                return (f"transformer", f"blocks_{idx}") + _BLOCK_LEAF[leaf]
            # FFN experts: mlp.v.fc1.weight → mlp_v/fc1/kernel
            parts = leaf.split(".")
            if parts[0] == "mlp" and len(parts) == 4:
                _, route, fc, wb = parts
                leaf_name = "kernel" if wb == "weight" else "bias"
                return ("transformer", f"blocks_{idx}", f"mlp_{route}", fc,
                        leaf_name)
            return None
    # unprefixed backbone top-levels (BEiT)
    for bare in ("pos_embed", "img_cls_token", "img_mask_token"):
        if key == bare:
            return ("transformer", bare)
    if key.startswith("patch_embed.proj."):
        return _TOP["transformer." + key]
    return None


def load_torch_checkpoint(path: str) -> dict:
    """torch.load a .pth (handles {'model': sd} / {'module': sd} wrappers)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        for key in ("model", "module", "state_dict"):
            if key in obj and isinstance(obj[key], dict):
                return obj[key]
        return obj
    return obj.state_dict()


# flax path → torch name (inverse mapping) ---------------------------------

def _inverse_top() -> dict[tuple, str]:
    inv: dict[tuple, str] = {}
    for torch_key, path in _TOP.items():
        # two torch aliases can share a path (nlvr2_embedding); first wins
        inv.setdefault(tuple(path), torch_key)
    return inv


def export_reference_state(params: Any) -> dict[str, np.ndarray]:
    """Flax task param tree → reference-format state dict (torch names +
    layouts) — the exact inverse of `import_torch_state`'s mapping, so
    weights trained here round-trip into the reference's .pth format
    (vlmo_module.py state-dict namespace). Flax paths with no reference
    counterpart (e.g. ISDA running stats) are skipped; callers can diff the
    returned keys against the tree if they need completeness."""
    inv_top = _inverse_top()
    inv_block = {tuple(path): name for name, path in _BLOCK_LEAF.items()}
    out: dict[str, np.ndarray] = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = tuple(str(getattr(p, "key", p)) for p in path)
        arr = np.asarray(leaf)
        torch_key = None
        if keys in inv_top:
            torch_key = inv_top[keys]
        elif (
            len(keys) >= 3
            and keys[0] == "transformer"
            and keys[1].startswith("blocks_")
        ):
            idx = keys[1].removeprefix("blocks_")
            rest = keys[2:]
            if rest in inv_block:
                torch_key = f"transformer.blocks.{idx}.{inv_block[rest]}"
            elif rest[0].startswith("mlp_") and len(rest) == 3:
                route = rest[0].removeprefix("mlp_")
                wb = "weight" if rest[2] == "kernel" else "bias"
                torch_key = (
                    f"transformer.blocks.{idx}.mlp.{route}.{rest[1]}.{wb}"
                )
        if torch_key is None:
            continue
        # inverse layout transform (see _transform)
        if keys[-1] == "kernel":
            if arr.ndim == 2:
                arr = arr.T
            elif arr.ndim == 4:
                arr = np.transpose(arr, (3, 2, 0, 1))
        out[torch_key] = arr
    return out
