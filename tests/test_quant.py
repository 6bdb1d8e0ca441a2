"""W8A8 int8-MXU quantized dense (ops/quant.py).

Beyond-the-reference option (the reference trains fp16 AMP and ships no
int8 path — utils/utils.py AMP scaler); parity configs keep quantize=none.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exploremultimodal_tpu.ops.quant import QuantDense, dense, quant_dot


def test_quant_dot_matches_exact_dot_within_quantization_error():
    """Dynamic symmetric W8A8: per-tensor activation scale, per-channel
    kernel scale. For well-conditioned inputs the forward must sit within
    the int8 rounding envelope of the exact dot."""
    kx, kw = jax.random.split(jax.random.key(0))
    x = jax.random.normal(kx, (64, 96), jnp.float32)
    w = jax.random.normal(kw, (96, 128), jnp.float32) * 0.05

    y_q = np.asarray(jax.jit(quant_dot)(x, w), np.float32)
    y_ref = np.asarray(x @ w, np.float32)

    # rounding error per product ~ (sx*|w| + sw*|x|)/2 summed over K; for
    # normal inputs the relative error of the row-sums stays ~1-2%
    denom = np.maximum(np.abs(y_ref), np.abs(y_ref).mean())
    rel = np.abs(y_q - y_ref) / denom
    assert rel.mean() < 0.02, rel.mean()
    assert rel.max() < 0.2, rel.max()


def test_quant_dot_straight_through_grads_match_exact_dot():
    """Backward is the unquantized dot's VJP (STE): gradients must equal
    jnp.dot's gradients bit-for-bit at fp32 (same dots, same order)."""
    kx, kw, kg = jax.random.split(jax.random.key(1), 3)
    x = jax.random.normal(kx, (4, 7, 24), jnp.float32)
    w = jax.random.normal(kw, (24, 16), jnp.float32)
    g = jax.random.normal(kg, (4, 7, 16), jnp.float32)

    _, vjp_q = jax.vjp(quant_dot, x, w)
    _, vjp_ref = jax.vjp(lambda a, b: jnp.einsum("bnk,ko->bno", a, b), x, w)
    dx_q, dw_q = vjp_q(g)
    dx_r, dw_r = vjp_ref(g)
    np.testing.assert_allclose(np.asarray(dx_q), np.asarray(dx_r), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dw_q), np.asarray(dw_r), rtol=1e-6)


def test_quant_dense_param_tree_interchangeable_with_nn_dense():
    """QuantDense must expose nn.Dense's exact parameter tree (kernel/bias,
    same shapes and init family) so checkpoints, the torch importer and
    partitioning rules apply unchanged."""
    import flax.linen as nn

    x = jnp.ones((2, 5, 12), jnp.float32)
    p_ref = nn.Dense(8).init(jax.random.key(2), x)["params"]
    p_q = QuantDense(8).init(jax.random.key(2), x)["params"]
    assert jax.tree.structure(p_ref) == jax.tree.structure(p_q)
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_q)):
        assert a.shape == b.shape and a.dtype == b.dtype
    # same init stream -> identical values (lecun_normal kernel, zero bias)
    np.testing.assert_array_equal(
        np.asarray(p_ref["kernel"]), np.asarray(p_q["kernel"])
    )

    # forward with nn.Dense-trained params stays close to the bf16 forward
    y_ref = nn.Dense(8, dtype=jnp.bfloat16).apply({"params": p_ref}, x)
    y_q = QuantDense(8, dtype=jnp.bfloat16).apply({"params": p_ref}, x)
    np.testing.assert_allclose(
        np.asarray(y_ref, np.float32), np.asarray(y_q, np.float32),
        rtol=0.05, atol=0.05,
    )


def test_quant_dot_saturates_outliers_instead_of_overflowing():
    x = jnp.array([[1000.0, 1e-3], [1e-3, 1e-3]], jnp.float32)
    w = jnp.eye(2, dtype=jnp.float32)
    y = np.asarray(quant_dot(x, w))
    assert np.isfinite(y).all()
    # the outlier dominates the per-tensor scale; small entries quantize to 0
    np.testing.assert_allclose(y[0, 0], 1000.0, rtol=0.02)
    assert y[1, 1] == 0.0


def test_dense_factory_dispatch_and_unknown_mode():
    import flax.linen as nn

    assert isinstance(dense("none", 4), nn.Dense)
    assert isinstance(dense("w8a8", 4), QuantDense)
    with pytest.raises(ValueError, match="quantize"):
        dense("int4", 4)


def test_pretrain_txt_loss_decreases_under_w8a8(tmp_path):
    """QAT sanity: the full jitted pretrain_txt step with model.quantize=w8a8
    (int8 forward dots + STE backward) still overfits one tiny batch — the
    quantization noise must not break optimization."""
    from tests.test_trainer_e2e import make_trainer

    trainer, _ = make_trainer(
        tmp_path / "q", ["train=pretrain_txt", "model.quantize=w8a8"]
    )
    loader = trainer.data.train_loader()
    state = trainer.init_state(next(iter(loader)))
    train_step = trainer.make_train_step()
    batch = next(iter(trainer.feeder(iter(loader))))
    losses = []
    for _ in range(6):
        state, metrics = train_step(state, batch, jnp.asarray(0.0))
        losses.append(float(metrics["total_loss"]))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses


def test_vlmo_block_trains_under_w8a8(tmp_path):
    """model.quantize=w8a8 end-to-end: a tiny VLMO forward+backward is
    finite, and the param tree is identical to the bf16 model's (pure
    compute-path toggle)."""
    from exploremultimodal_tpu.models.vlmo import VLMO

    def build(q):
        return VLMO(
            img_size=32, patch_size=16, embed_dim=32, depth=2, num_heads=2,
            max_text_len=8, fusion_layer=1, dtype=jnp.bfloat16, quantize=q,
        )

    img = jnp.ones((2, 32, 32, 3), jnp.float32)
    v_ref = build("none").init(jax.random.key(0), img, method="forward_features")
    v_q = build("w8a8").init(jax.random.key(0), img, method="forward_features")
    assert jax.tree.structure(v_ref) == jax.tree.structure(v_q)

    model = build("w8a8")

    def loss(params):
        out = model.apply({"params": params}, img, method="forward_features")
        return (out[0].astype(jnp.float32) ** 2).mean()

    val, grads = jax.value_and_grad(loss)(v_q["params"])
    assert np.isfinite(float(val))
    assert all(np.isfinite(np.asarray(g, np.float32)).all()
               for g in jax.tree.leaves(grads))
