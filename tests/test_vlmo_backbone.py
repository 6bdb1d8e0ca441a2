import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exploremultimodal_tpu.models.vlmo import VLMO, expert_layout


def tiny_vlmo(**kw):
    defaults = dict(
        img_size=32,
        patch_size=16,
        embed_dim=64,
        depth=4,
        num_heads=4,
        max_text_len=12,
        vocab_size=100,
        fusion_layer=2,
        init_values=0.1,
        drop_rate=0.0,
        attn_drop_rate=0.0,
        drop_path_rate=0.0,
    )
    defaults.update(kw)
    return VLMO(**defaults)


def _init(model, rng=0):
    img = jnp.zeros((2, model.img_size, model.img_size, 3))
    txt = jnp.zeros((2, model.max_text_len), jnp.int32)
    mask = jnp.ones_like(txt)
    variables = model.init(
        jax.random.key(rng), img=img, txt=txt, txt_mask=mask,
        method=VLMO.init_streams,
    )
    return variables


def test_three_stream_shapes():
    model = tiny_vlmo()
    variables = _init(model)
    img = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3)), jnp.float32)
    txt = jnp.asarray(np.random.default_rng(1).integers(0, 100, (2, 12)), jnp.int32)
    mask = jnp.ones((2, 12), jnp.int32)

    n_patches = (32 // 16) ** 2
    feats, m = model.apply(variables, img=img, method=VLMO.forward_features)
    assert feats.shape == (2, n_patches + 1, 64) and m.shape == (2, n_patches + 1)

    feats, m = model.apply(
        variables, txt=txt, txt_mask=mask, method=VLMO.forward_features
    )
    assert feats.shape == (2, 12, 64)

    feats, m = model.apply(
        variables, img=img, txt=txt, txt_mask=mask, method=VLMO.forward_features
    )
    assert feats.shape == (2, 12 + n_patches + 1, 64)
    assert m.shape == (2, 12 + n_patches + 1)

    pooled = model.apply(variables, feats, method=VLMO.pool)
    assert pooled.shape == (2, 64)
    assert np.all(np.abs(np.asarray(pooled)) <= 1.0)  # tanh


@pytest.mark.parametrize("mode", [True, "dots"])
def test_remat_modes_match_no_remat(mode):
    """remat=true (whole-block) and remat='dots' (selective save-dots
    policy) are pure memory/scheduling levers: identical forward values AND
    gradients vs no remat."""
    img = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 32, 32, 3)), jnp.float32
    )
    txt = jnp.asarray(
        np.random.default_rng(1).integers(0, 100, (2, 12)), jnp.int32
    )
    mask = jnp.ones((2, 12), jnp.int32)

    base = tiny_vlmo()
    variables = _init(base)

    def loss_fn(model):
        def f(params):
            feats, _ = model.apply(
                {"params": params}, img=img, txt=txt, txt_mask=mask,
                method=VLMO.forward_features,
            )
            return jnp.sum(feats ** 2)
        return f

    ref_val, ref_grads = jax.value_and_grad(loss_fn(base))(variables["params"])
    rem_val, rem_grads = jax.value_and_grad(loss_fn(tiny_vlmo(remat=mode)))(
        variables["params"]
    )
    np.testing.assert_allclose(float(ref_val), float(rem_val), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(ref_grads), jax.tree.leaves(rem_grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                                   atol=1e-6)


def test_padded_text_tokens_do_not_leak():
    """Changing token ids at masked (padding) positions must not change
    features at valid positions — the additive −inf key mask semantics."""
    model = tiny_vlmo()
    variables = _init(model)
    rng = np.random.default_rng(2)
    txt = rng.integers(0, 100, (2, 12))
    mask = np.ones((2, 12), np.int32)
    mask[:, 8:] = 0

    txt2 = txt.copy()
    txt2[:, 8:] = rng.integers(0, 100, (2, 4))

    f1, _ = model.apply(
        variables, txt=jnp.asarray(txt), txt_mask=jnp.asarray(mask),
        method=VLMO.forward_features,
    )
    f2, _ = model.apply(
        variables, txt=jnp.asarray(txt2), txt_mask=jnp.asarray(mask),
        method=VLMO.forward_features,
    )
    np.testing.assert_allclose(
        np.asarray(f1[:, :8]), np.asarray(f2[:, :8]), rtol=1e-5, atol=1e-6
    )


def test_mask_token_substitution_hides_patch_content():
    """BEiT-style masked patches are replaced by img_mask_token before the
    blocks, so pixel content inside masked patches cannot affect features."""
    model = tiny_vlmo()
    variables = _init(model)
    rng = np.random.default_rng(3)
    img1 = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
    img2 = img1.copy()
    img2[0, :16, :16] = rng.normal(size=(16, 16, 3))  # patch 0 content changes

    bmp = np.zeros((1, 4), np.int32)
    bmp[0, 0] = 1  # mask patch 0

    f1, _ = model.apply(
        variables, img=jnp.asarray(img1), bool_masked_pos=jnp.asarray(bmp),
        method=VLMO.forward_features,
    )
    f2, _ = model.apply(
        variables, img=jnp.asarray(img2), bool_masked_pos=jnp.asarray(bmp),
        method=VLMO.forward_features,
    )
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=1e-6)

    # without the mask the change must propagate
    f3, _ = model.apply(
        variables, img=jnp.asarray(img1), method=VLMO.forward_features
    )
    f4, _ = model.apply(
        variables, img=jnp.asarray(img2), method=VLMO.forward_features
    )
    assert not np.allclose(np.asarray(f3), np.asarray(f4))


def test_expert_layout_matches_reference_surgery():
    # pretrain_txt: no 'vl' anywhere (vlmo_module.py:150-153)
    layout = expert_layout(4, 2, "pretrain_txt")
    assert all(set(e) == {"v", "l"} for e in layout)
    # pretrain_mum: no 'vl' below fusion (vlmo_module.py:165-167)
    layout = expert_layout(4, 2, "pretrain_mum")
    assert set(layout[0]) == {"v", "l"} and set(layout[3]) == {"v", "l", "vl"}
    # default: everything
    layout = expert_layout(4, 2, None)
    assert all(set(e) == {"v", "l", "vl"} for e in layout)


def test_expert_layout_forbids_missing_route():
    model = tiny_vlmo(experts_per_block=expert_layout(4, 2, "pretrain_txt"))
    img = jnp.zeros((1, 32, 32, 3))
    txt = jnp.zeros((1, 12), jnp.int32)
    mask = jnp.ones((1, 12), jnp.int32)
    variables = model.init(
        jax.random.key(0), img=img, txt=txt, txt_mask=mask,
        method=VLMO.init_streams,
    )
    # fused forward requires the 'vl' expert → must fail
    with pytest.raises(ValueError, match="route 'vl'"):
        model.apply(
            variables, img=img, txt=txt, txt_mask=mask,
            method=VLMO.forward_features,
        )
    # and the param tree must not contain any vl expert
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    assert not any("mlp_vl" in jax.tree_util.keystr(k) for k, _ in flat)


def test_dropout_rngs_train_vs_eval():
    model = tiny_vlmo(drop_rate=0.1, attn_drop_rate=0.1, drop_path_rate=0.1)
    variables = _init(model)
    img = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3)), jnp.float32)

    f_eval, _ = model.apply(variables, img=img, method=VLMO.forward_features)
    f_eval2, _ = model.apply(variables, img=img, method=VLMO.forward_features)
    np.testing.assert_array_equal(np.asarray(f_eval), np.asarray(f_eval2))

    rngs = {"dropout": jax.random.key(1), "droppath": jax.random.key(2)}
    f_train, _ = model.apply(
        variables, img=img, deterministic=False,
        method=VLMO.forward_features, rngs=rngs,
    )
    assert not np.allclose(np.asarray(f_eval), np.asarray(f_train))


def test_forward_interval_slice_composition():
    """Running [0, k) then [k, depth) must equal running [0, depth)."""
    model = tiny_vlmo()
    variables = _init(model)
    img = jnp.asarray(np.random.default_rng(5).normal(size=(1, 32, 32, 3)), jnp.float32)

    full = model.apply(
        variables, img, route="v", need_embed=True, need_norm=True,
        method=VLMO.forward_interval,
    )
    half = model.apply(
        variables, img, route="v", need_embed=True, out_layer=2,
        method=VLMO.forward_interval,
    )
    rest = model.apply(
        variables, half, route="v", in_layer=2, need_norm=True,
        method=VLMO.forward_interval,
    )
    np.testing.assert_allclose(np.asarray(full), np.asarray(rest), rtol=1e-6)


def test_2d_sincos_pos_embed():
    from exploremultimodal_tpu.models.vlmo import build_2d_sincos_position_embedding

    pe = build_2d_sincos_position_embedding(4, 32)
    assert pe.shape == (1, 17, 32)
    assert np.allclose(np.asarray(pe)[0, 0], 0.0)  # [CLS] row zero
    # rows are distinct positions
    body = np.asarray(pe)[0, 1:]
    assert np.unique(body.round(4), axis=0).shape[0] == 16
    # swap into a model via parameter surgery and run (2x2 patch grid)
    pe = build_2d_sincos_position_embedding(2, 32)
    model = tiny_vlmo(embed_dim=32, num_heads=2)
    variables = _init(model)
    params = dict(variables["params"])
    assert params["pos_embed"].shape == pe.shape
    params["pos_embed"] = pe
    img = jnp.zeros((1, 32, 32, 3))
    feats, _ = model.apply({"params": params}, img=img,
                           method=VLMO.forward_features)
    assert np.isfinite(np.asarray(feats)).all()
