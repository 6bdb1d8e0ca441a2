"""bf16 fused whole-MLP Pallas kernel (ops/mlp_pallas.py) — interpret-mode
parity on CPU, VJP correctness, dropout semantics, and the model-level
mlp_impl=fused route (param-tree identity + finite training step)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.quick


def _mats(kdim=96, hdim=384, odim=96, m=(2, 50)):
    kx, k1, k2 = jax.random.split(jax.random.key(7), 3)
    x = jax.random.normal(kx, (*m, kdim), jnp.float32)
    w1 = jax.random.normal(k1, (kdim, hdim), jnp.float32) * 0.05
    b1 = jax.random.normal(jax.random.key(8), (hdim,), jnp.float32) * 0.01
    w2 = jax.random.normal(k2, (hdim, odim), jnp.float32) * 0.05
    b2 = jax.random.normal(jax.random.key(9), (odim,), jnp.float32) * 0.01
    return x, w1, b1, w2, b2


def _ref_tanh(a, u1, c1, u2, c2):
    return jax.nn.gelu(a @ u1 + c1, approximate=True) @ u2 + c2


def test_fused_bf16_mlp_matches_reference():
    """Forward is numerically the tanh-gelu MLP (f32 interpret: tight), and
    within the documented ~3e-4 gelu-form envelope of the exact-erf MLP."""
    from exploremultimodal_tpu.ops.mlp_pallas import fused_bf16_mlp

    x, w1, b1, w2, b2 = _mats()
    y = np.asarray(fused_bf16_mlp(x, w1, b1, w2, b2, True), np.float32)
    yr = np.asarray(_ref_tanh(x, w1, b1, w2, b2), np.float32)
    np.testing.assert_allclose(y, yr, rtol=2e-5, atol=2e-6)

    y_exact = np.asarray(
        jax.nn.gelu(x @ w1 + b1, approximate=False) @ w2 + b2, np.float32
    )
    # |tanh-form - erf-form| <= ~3e-4 per hidden unit, contracted by w2
    assert np.abs(y - y_exact).max() < 5e-3


def test_fused_bf16_mlp_vjp_matches_tanh_reference():
    """Backward is the exact VJP of the kernel's own (tanh-gelu) forward."""
    from exploremultimodal_tpu.ops.mlp_pallas import fused_bf16_mlp

    x, w1, b1, w2, b2 = _mats()
    y, vk = jax.vjp(lambda *a: fused_bf16_mlp(*a, True), x, w1, b1, w2, b2)
    g = jax.random.normal(jax.random.key(10), y.shape, jnp.float32)
    _, vr = jax.vjp(_ref_tanh, x, w1, b1, w2, b2)
    for a, b in zip(vk(g), vr(g)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_fused_bf16_mlp_dropout_mask_semantics():
    """bits >= threshold keeps an element scaled by 65536/(65536-t)
    (FastDropout contract); the backward sees the identical mask."""
    from exploremultimodal_tpu.ops.mlp_pallas import fused_bf16_mlp_dropout

    x, w1, b1, w2, b2 = _mats()
    threshold = 20000
    bits = jax.random.bits(
        jax.random.key(3), x.shape[:-1] + (w1.shape[1],), jnp.uint16
    )

    def ref(a, u1, c1, u2, c2):
        h = jax.nn.gelu(a @ u1 + c1, approximate=True)
        keep = bits.astype(jnp.int32) >= threshold
        h = jnp.where(keep, h * (65536.0 / (65536.0 - threshold)), 0.0)
        return h @ u2 + c2

    y, vk = jax.vjp(
        lambda *a: fused_bf16_mlp_dropout(*a, bits, threshold, True),
        x, w1, b1, w2, b2,
    )
    yr, vr = jax.vjp(ref, x, w1, b1, w2, b2)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(yr), rtol=2e-5, atol=2e-6
    )
    g = jax.random.normal(jax.random.key(11), y.shape, jnp.float32)
    for a, b in zip(vk(g), vr(g)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_fits_vmem_gate():
    from exploremultimodal_tpu.ops.mlp_pallas import fits_vmem

    assert fits_vmem(768, 3072, 768)  # BERT/VLMo-Base: 9.4 MB resident
    assert not fits_vmem(1024, 4096, 1024)  # large: 16.8 MB — XLA path


def test_mlp_impl_fused_same_param_tree_and_close_forward():
    """model.mlp_impl=fused is a pure compute-path toggle: identical param
    tree and init values vs the XLA path, eval forwards within the
    gelu-form envelope, and a training step stays finite."""
    from exploremultimodal_tpu.models.vlmo import VLMO

    def build(impl):
        return VLMO(
            img_size=32, patch_size=16, embed_dim=128, depth=2, num_heads=2,
            max_text_len=8, fusion_layer=1, mlp_ratio=2.0,
            drop_rate=0.1, mlp_impl=impl,
        )

    img = jnp.ones((2, 32, 32, 3), jnp.float32)
    v_ref = build("xla").init(jax.random.key(0), img,
                              method="forward_features")
    v_f = build("fused").init(jax.random.key(0), img,
                              method="forward_features")
    assert jax.tree.structure(v_ref) == jax.tree.structure(v_f)
    for a, b in zip(jax.tree.leaves(v_ref), jax.tree.leaves(v_f)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    out_ref = build("xla").apply(v_ref, img, method="forward_features")[0]
    out_f = build("fused").apply(v_f, img, method="forward_features")[0]
    np.testing.assert_allclose(
        np.asarray(out_f, np.float32), np.asarray(out_ref, np.float32),
        rtol=1e-2, atol=5e-3,
    )

    model = build("fused")

    def loss(params):
        out = model.apply(
            {"params": params}, img, method="forward_features",
            deterministic=False,
            rngs={"dropout": jax.random.key(1), "droppath": jax.random.key(2)},
        )
        return (out[0].astype(jnp.float32) ** 2).mean()

    val, grads = jax.value_and_grad(loss)(v_f["params"])
    assert np.isfinite(float(val))
    assert all(np.isfinite(np.asarray(g, np.float32)).all()
               for g in jax.tree.leaves(grads))
