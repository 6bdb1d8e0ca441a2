"""fp32 logit parity: Flax VLMO vs an independent functional torch oracle.

One set of random weights drives both implementations across all three
streams — the BASELINE.json "VLMo logits within fp32 tolerance" requirement
validated without a reference checkpoint.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from exploremultimodal_tpu.models.vlmo import VLMO
from tests import torch_oracle as oracle

TOL = dict(rtol=2e-4, atol=2e-5)


def build_pair(seed=0, **kw):
    cfg = dict(
        img_size=64, patch_size=16, embed_dim=48, depth=3, num_heads=4,
        max_text_len=10, vocab_size=64, fusion_layer=1, init_values=0.1,
        drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.0,
    )
    cfg.update(kw)
    model = VLMO(**cfg)
    img = jnp.zeros((2, cfg["img_size"], cfg["img_size"], 3))
    txt = jnp.zeros((2, cfg["max_text_len"]), jnp.int32)
    mask = jnp.ones_like(txt)
    variables = model.init(
        jax.random.key(seed), img=img, txt=txt, txt_mask=mask,
        method=VLMO.init_streams,
    )
    # make the zero-initialized embellishments non-trivial for a strict test
    params = variables["params"]
    k = jax.random.key(seed + 1)
    for name in ("img_mask_token", "img_cls_token", "pos_embed"):
        k, sub = jax.random.split(k)
        params[name] = 0.02 * jax.random.normal(sub, params[name].shape)
    variables = {"params": params}
    w = oracle.export_backbone_weights(params)
    return model, variables, w, cfg


def _data(cfg, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.normal(size=(2, cfg["img_size"], cfg["img_size"], 3)).astype(np.float32)
    txt = rng.integers(0, cfg["vocab_size"], (2, cfg["max_text_len"]))
    mask = np.ones((2, cfg["max_text_len"]), np.int64)
    mask[1, 6:] = 0
    n_patches = (cfg["img_size"] // cfg["patch_size"]) ** 2
    bmp = (rng.random((2, n_patches)) < 0.4).astype(np.int64)
    return img, txt, mask, bmp


def test_img_only_parity():
    model, variables, w, cfg = build_pair()
    img, _, _, bmp = _data(cfg)
    ours, _ = model.apply(
        variables, img=jnp.asarray(img), bool_masked_pos=jnp.asarray(bmp),
        method=VLMO.forward_features,
    )
    theirs, _ = oracle.forward_features(
        w, cfg["depth"], cfg["num_heads"], cfg["fusion_layer"],
        img=torch.from_numpy(img).permute(0, 3, 1, 2),
        bool_masked_pos=torch.from_numpy(bmp),
    )
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), **TOL)


def test_txt_only_parity():
    model, variables, w, cfg = build_pair(seed=3)
    _, txt, mask, _ = _data(cfg, seed=3)
    ours, _ = model.apply(
        variables, txt=jnp.asarray(txt), txt_mask=jnp.asarray(mask),
        method=VLMO.forward_features,
    )
    theirs, _ = oracle.forward_features(
        w, cfg["depth"], cfg["num_heads"], cfg["fusion_layer"],
        txt=torch.from_numpy(txt), txt_mask=torch.from_numpy(mask),
    )
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), **TOL)


def test_fused_parity_and_pooler():
    model, variables, w, cfg = build_pair(seed=7)
    img, txt, mask, _ = _data(cfg, seed=7)
    ours, co_mask = model.apply(
        variables, img=jnp.asarray(img), txt=jnp.asarray(txt),
        txt_mask=jnp.asarray(mask), method=VLMO.forward_features,
    )
    theirs, co_mask_t = oracle.forward_features(
        w, cfg["depth"], cfg["num_heads"], cfg["fusion_layer"],
        img=torch.from_numpy(img).permute(0, 3, 1, 2),
        txt=torch.from_numpy(txt), txt_mask=torch.from_numpy(mask),
    )
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), **TOL)
    np.testing.assert_array_equal(np.asarray(co_mask), co_mask_t.numpy())

    pooled = model.apply(variables, ours, method=VLMO.pool)
    pooled_t = oracle.pool(theirs.float(), w)
    np.testing.assert_allclose(np.asarray(pooled), pooled_t.numpy(), **TOL)


def test_fused_parity_pallas_kernel():
    """The Pallas flash-attention path must also hold fp32 parity."""
    model, variables, w, cfg = build_pair(seed=9)
    model_pallas = VLMO(**{**cfg, "attn_impl": "pallas"})
    img, txt, mask, _ = _data(cfg, seed=9)
    ours, _ = model_pallas.apply(
        variables, img=jnp.asarray(img), txt=jnp.asarray(txt),
        txt_mask=jnp.asarray(mask), method=VLMO.forward_features,
    )
    theirs, _ = oracle.forward_features(
        w, cfg["depth"], cfg["num_heads"], cfg["fusion_layer"],
        img=torch.from_numpy(img).permute(0, 3, 1, 2),
        txt=torch.from_numpy(txt), txt_mask=torch.from_numpy(mask),
    )
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=5e-4, atol=5e-5)
