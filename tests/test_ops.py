import jax
import jax.numpy as jnp
import numpy as np

from exploremultimodal_tpu.ops import multi_head_attention, drop_path
from exploremultimodal_tpu.ops.attention import key_padding_bias


def _naive_attention(q, k, v, mask=None):
    """Oracle mirroring reference semantics (vlmo.py:88-95) in numpy."""
    q, k, v = map(np.asarray, (q, k, v))
    scale = q.shape[-1] ** -0.5
    scores = np.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if mask is not None:
        scores = np.where(np.asarray(mask)[:, None, None, :] > 0, scores, -np.inf)
    scores = scores - scores.max(-1, keepdims=True)
    probs = np.exp(scores)
    probs = probs / probs.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", probs, v)


def _rand_qkv(rng, B=2, H=3, N=37, D=16):
    qs = rng.normal(size=(3, B, H, N, D)).astype(np.float32)
    return jnp.asarray(qs[0]), jnp.asarray(qs[1]), jnp.asarray(qs[2])


def test_xla_attention_matches_naive_with_padding_mask():
    rng = np.random.default_rng(0)
    q, k, v = _rand_qkv(rng)
    mask = np.ones((2, 37), dtype=np.int32)
    mask[0, 20:] = 0  # pad out the tail keys of sample 0
    out = multi_head_attention(
        q, k, v, bias=key_padding_bias(jnp.asarray(mask)), impl="xla"
    )
    expected = _naive_attention(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-5)


def test_pallas_attention_matches_xla():
    rng = np.random.default_rng(1)
    for N in (40, 197, 237):
        q, k, v = _rand_qkv(rng, B=2, H=2, N=N, D=32)
        mask = np.ones((2, N), dtype=np.int32)
        mask[1, N // 2:] = 0
        bias = key_padding_bias(jnp.asarray(mask))
        ref = multi_head_attention(q, k, v, bias=bias, impl="xla")
        out = multi_head_attention(q, k, v, bias=bias, impl="pallas")
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )


def test_pallas_attention_no_mask():
    rng = np.random.default_rng(2)
    q, k, v = _rand_qkv(rng, B=1, H=4, N=128, D=64)
    ref = multi_head_attention(q, k, v, impl="xla")
    out = multi_head_attention(q, k, v, impl="pallas")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_attention_dropout_changes_output_but_keeps_scale():
    rng = np.random.default_rng(3)
    q, k, v = _rand_qkv(rng)
    det = multi_head_attention(q, k, v, deterministic=True)
    drop = multi_head_attention(
        q, k, v,
        dropout_rate=0.5,
        dropout_rng=jax.random.key(0),
        deterministic=False,
    )
    assert not np.allclose(np.asarray(det), np.asarray(drop))
    # means stay comparable (inverted-dropout scaling)
    assert abs(np.asarray(drop).mean() - np.asarray(det).mean()) < 0.1


def test_drop_path():
    x = jnp.ones((8, 4, 4))
    assert np.allclose(drop_path(x, 0.5, None, deterministic=True), x)
    out = np.asarray(drop_path(x, 0.5, jax.random.key(0), deterministic=False))
    per_sample = out.reshape(8, -1)
    # each sample is either all zeros or all 1/keep
    for row in per_sample:
        assert np.allclose(row, 0.0) or np.allclose(row, 2.0)


def test_pallas_attention_gradients_match_xla():
    """The Pallas forward kernel's custom VJP (recompute backward) must agree
    with differentiating the XLA chain."""
    rng = np.random.default_rng(7)
    q, k, v = _rand_qkv(rng, B=1, H=2, N=64, D=32)
    mask = np.ones((1, 64), np.int32)
    mask[0, 40:] = 0
    bias = key_padding_bias(jnp.asarray(mask))

    def loss(impl):
        def f(q, k, v):
            out = multi_head_attention(q, k, v, bias=bias, impl=impl)
            return jnp.sum(out * jnp.cos(out))

        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    g_xla = loss("xla")
    g_pallas = loss("pallas")
    for a, b in zip(g_xla, g_pallas):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_pallas_backward_matches_xla_at_vlmo_shapes():
    """The Pallas flash BACKWARD kernel (dq/dk/dv from the saved logsumexp)
    must agree with differentiating the XLA chain at a padded, masked VLMo
    shape (N=237 → padded 256)."""
    rng = np.random.default_rng(13)
    q, k, v = _rand_qkv(rng, B=2, H=3, N=237, D=64)
    mask = np.ones((2, 237), np.int32)
    mask[0, 200:] = 0
    bias = key_padding_bias(jnp.asarray(mask))

    def grads(impl):
        def f(q, k, v):
            out = multi_head_attention(q, k, v, bias=bias, impl=impl)
            return jnp.sum(out * jnp.sin(out))

        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    for a, b in zip(grads("xla"), grads("pallas")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_long_sequence_flash_attention_matches_xla():
    """LONG_SEQ_THRESHOLD < N <= FULL_ROW_FWD_MAX keeps the full-row forward
    kernel with an XLA-recompute backward; parity vs XLA."""
    rng = np.random.default_rng(11)
    N = 1536
    q, k, v = _rand_qkv(rng, B=1, H=2, N=N, D=32)
    mask = np.ones((1, N), np.int32)
    mask[0, 1200:] = 0
    bias = key_padding_bias(jnp.asarray(mask))
    ref = multi_head_attention(q, k, v, bias=bias, impl="xla")
    out = multi_head_attention(q, k, v, bias=bias, impl="pallas")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)

    # gradients flow through the recompute backward at long N too
    g = jax.grad(lambda q_: jnp.sum(
        multi_head_attention(q_, k, v, bias=bias, impl="pallas") ** 2
    ))(q)
    g_ref = jax.grad(lambda q_: jnp.sum(
        multi_head_attention(q_, k, v, bias=bias, impl="xla") ** 2
    ))(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=2e-3, atol=2e-4)


def test_beyond_full_row_k_blocked_kernel_matches_xla():
    """N > FULL_ROW_FWD_MAX streams K/V blocks with online softmax."""
    from exploremultimodal_tpu.ops.flash_attention import FULL_ROW_FWD_MAX

    rng = np.random.default_rng(12)
    N = FULL_ROW_FWD_MAX + 128
    q, k, v = _rand_qkv(rng, B=1, H=1, N=N, D=32)
    mask = np.ones((1, N), np.int32)
    mask[0, N - 300:] = 0
    bias = key_padding_bias(jnp.asarray(mask))
    ref = multi_head_attention(q, k, v, bias=bias, impl="xla")
    out = multi_head_attention(q, k, v, bias=bias, impl="pallas")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_in_kernel_dropout_matches_oracle_mask_fwd_and_bwd():
    """The dropout flash kernels (fwd + regenerated-mask bwd) must agree with
    an XLA chain that applies the EXACT mask the kernels generate internally
    (dropout_keep_mask is the host-side oracle of the in-kernel hash)."""
    from exploremultimodal_tpu.ops.flash_attention import (
        BLOCK_Q, dropout_keep_mask, flash_attention,
    )

    rng = np.random.default_rng(21)
    B, H, N, D, rate = 2, 3, 197, 64, 0.1
    n_pad = -(-N // BLOCK_Q) * BLOCK_Q
    q, k, v = _rand_qkv(rng, B=B, H=H, N=N, D=D)
    mask = np.ones((B, N), np.int32)
    mask[0, 150:] = 0
    bias = key_padding_bias(jnp.asarray(mask))
    seed = jnp.asarray([1234], jnp.int32)
    keep = dropout_keep_mask(seed, B, H, n_pad, rate)[:, :, :N, :N]

    def ref(q, k, v):
        scale = D ** -0.5
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale + bias
        probs = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", probs * keep, v)

    def kern(q, k, v):
        return flash_attention(q, k, v, bias=bias, scale=D ** -0.5,
                               dropout_rate=rate, dropout_seed=seed)

    np.testing.assert_allclose(np.asarray(kern(q, k, v)),
                               np.asarray(ref(q, k, v)),
                               rtol=2e-4, atol=2e-5)

    def loss(f):
        return jax.grad(
            lambda q_, k_, v_: jnp.sum(jnp.sin(f(q_, k_, v_))),
            argnums=(0, 1, 2),
        )(q, k, v)

    for a, b in zip(loss(kern), loss(ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_in_kernel_dropout_statistics_and_gating():
    """Keep-rate ≈ 1-rate; rate=0 path identical to the plain kernel; the
    multi_head_attention pallas impl routes dropout in-kernel at VLMo shapes
    and falls back to recompute beyond the fused-bwd ceiling."""
    from exploremultimodal_tpu.ops.flash_attention import dropout_keep_mask

    keep = np.asarray(dropout_keep_mask(jnp.asarray([7], jnp.int32),
                                        2, 2, 256, 0.3))
    frac = (keep > 0).mean()
    assert abs(frac - 0.7) < 0.01
    # distinct (bh) planes decorrelated
    assert not np.array_equal(keep[0, 0], keep[1, 1])

    rng = np.random.default_rng(22)
    q, k, v = _rand_qkv(rng, B=1, H=2, N=64, D=32)
    a = multi_head_attention(q, k, v, impl="pallas")
    b = multi_head_attention(q, k, v, impl="pallas", dropout_rate=0.0,
                             dropout_rng=jax.random.key(0),
                             deterministic=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # dropout active: output differs but mean is preserved (inverted scale)
    c = multi_head_attention(q, k, v, impl="pallas", dropout_rate=0.5,
                             dropout_rng=jax.random.key(0),
                             deterministic=False)
    assert not np.allclose(np.asarray(a), np.asarray(c))
    assert abs(np.asarray(c).mean() - np.asarray(a).mean()) < 0.1


def test_auto_impl_dispatch():
    """'auto' (the config default) = recompute when attention dropout is
    inactive (bit-identical), = the pallas in-kernel-dropout path when it is
    live (bit-identical to explicit impl='pallas' at the same seed) —
    the measured policy from the BENCH.md round-3 A/Bs."""
    rng = np.random.default_rng(5)
    q, k, v = _rand_qkv(rng, B=1, H=2, N=64, D=32)

    a = multi_head_attention(q, k, v, impl="auto")
    r = multi_head_attention(q, k, v, impl="recompute")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(r))

    key = jax.random.key(3)
    a_drop = multi_head_attention(q, k, v, impl="auto", dropout_rate=0.3,
                                  dropout_rng=key, deterministic=False)
    p_drop = multi_head_attention(q, k, v, impl="pallas", dropout_rate=0.3,
                                  dropout_rng=key, deterministic=False)
    np.testing.assert_array_equal(np.asarray(a_drop), np.asarray(p_drop))
    assert not np.allclose(np.asarray(a_drop), np.asarray(a))

    # deterministic (eval) with a configured dropout rate stays on recompute
    a_eval = multi_head_attention(q, k, v, impl="auto", dropout_rate=0.3,
                                  dropout_rng=key, deterministic=True)
    np.testing.assert_array_equal(np.asarray(a_eval), np.asarray(r))


def test_fast_dropout_semantics():
    """FastDropout = nn.Dropout semantics with an integer-threshold mask."""
    from exploremultimodal_tpu.ops import FastDropout

    x = jnp.ones((64, 257, 96), jnp.bfloat16)
    mod = FastDropout(0.1)

    # deterministic / rate-0 are identity (no rng needed)
    y = FastDropout(0.1).apply({}, x, deterministic=True)
    assert (np.asarray(y) == 1.0).all()
    y = FastDropout(0.0).apply({}, x, deterministic=False)
    assert (np.asarray(y) == 1.0).all()

    y = mod.apply({}, x, deterministic=False,
                  rngs={"dropout": jax.random.key(7)})
    arr = np.asarray(y, np.float32)
    kept = arr != 0.0
    # realized keep rate ~ Binomial(n, 0.9) — 5 sigma over n=1.58M draws
    keep_rate = kept.mean()
    assert abs(keep_rate - 0.9) < 5 * np.sqrt(0.9 * 0.1 / arr.size)
    # survivors are scaled by exactly 1/keep_prob (bf16-rounded)
    scale = 65536.0 / (65536 - round(0.1 * 65536))
    np.testing.assert_allclose(arr[kept], np.float32(np.float32(scale)).astype(
        np.float32), rtol=1e-2)
    # unbiased in expectation
    assert abs(arr.mean() - 1.0) < 0.01
    # deterministic given the key; different key → different mask
    y2 = mod.apply({}, x, deterministic=False,
                   rngs={"dropout": jax.random.key(7)})
    assert (np.asarray(y2) == np.asarray(y)).all()
    y3 = mod.apply({}, x, deterministic=False,
                   rngs={"dropout": jax.random.key(8)})
    assert not (np.asarray(y3) == np.asarray(y)).all()


def test_fast_dropout_rate_one_and_grad():
    from exploremultimodal_tpu.ops import FastDropout

    x = jnp.ones((8, 16), jnp.float32)
    y = FastDropout(1.0).apply({}, x, deterministic=False,
                               rngs={"dropout": jax.random.key(0)})
    assert (np.asarray(y) == 0.0).all()

    # grads flow only through kept elements, scaled like the forward
    def f(x):
        return FastDropout(0.5).apply(
            {}, x, deterministic=False, rngs={"dropout": jax.random.key(3)}
        ).sum()

    g = np.asarray(jax.grad(f)(x))
    assert set(np.round(np.unique(g), 4)).issubset(
        {0.0, np.round(65536.0 / (65536 - 32768), 4)}
    )


def test_mxu_dense_matches_nn_dense_fwd_and_grads():
    """MxuDense (MXU-routed bias grad, ops/dense.py) is numerically a
    drop-in for nn.Dense: same params, same forward, same grads up to
    summation order. A measured wash at the headline step (BENCH.md round
    3 "MXU bias-grad A/B") — kept as a utility, not used by the model."""
    import flax.linen as nn

    from exploremultimodal_tpu.ops.dense import MxuDense

    x = jax.random.normal(jax.random.key(0), (4, 9, 24), jnp.float32)

    ref = nn.Dense(16, dtype=jnp.bfloat16)
    new = MxuDense(16, dtype=jnp.bfloat16)
    params = ref.init(jax.random.key(1), x)["params"]
    assert jax.tree.structure(params) == jax.tree.structure(
        new.init(jax.random.key(1), x)["params"]
    )

    y_ref = ref.apply({"params": params}, x)
    y_new = new.apply({"params": params}, x)
    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_new))

    def loss(mod, p):
        out = mod.apply({"params": p}, x).astype(jnp.float32)
        return (out * out).sum()

    g_ref = jax.grad(lambda p: loss(ref, p))(params)
    g_new = jax.grad(lambda p: loss(new, p))(params)
    np.testing.assert_allclose(
        np.asarray(g_ref["kernel"]), np.asarray(g_new["kernel"]),
        rtol=2e-5, atol=2e-4,
    )
    # nn.Dense's bias grad reduce accumulates in bf16 (the cotangent dtype);
    # MxuDense's ones-dot accumulates fp32 on the MXU — compare at bf16
    # granularity, and check MxuDense against an fp32 oracle more tightly.
    np.testing.assert_allclose(
        np.asarray(g_ref["bias"]), np.asarray(g_new["bias"]),
        rtol=5e-2, atol=5e-2,
    )


def test_barrier_cotangent_is_exact_identity_in_both_passes():
    """barrier_cotangent (ops/dense.py) is a numerical no-op: identity
    forward, identity cotangent backward (only an optimization_barrier is
    inserted). A measured LOSS at the headline step (BENCH.md round 3
    "cotangent-barrier A/B") — kept as a utility, not used by the model."""
    from exploremultimodal_tpu.ops.dense import barrier_cotangent

    x = jax.random.normal(jax.random.key(7), (3, 5, 8), jnp.bfloat16)

    y = jax.jit(barrier_cotangent)(x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))

    def loss(v):
        return (barrier_cotangent(v).astype(jnp.float32) ** 2).sum()

    g = jax.jit(jax.grad(loss))(x)
    g_ref = jax.jit(jax.grad(lambda v: (v.astype(jnp.float32) ** 2).sum()))(x)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(g_ref))
