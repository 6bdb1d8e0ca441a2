"""dVAE tokenizer tests: torch-state import + bit-exact token parity.

A functional torch oracle implements the published OpenAI dVAE encoder conv
stack (7×7 input conv, bottleneck residual groups with post_gain, maxpools,
1×1 vocab head) using the vendored checkpoint naming scheme, generates random
weights in that scheme, and both stacks must produce identical argmax token
ids — the BASELINE.json "dVAE token IDs bit-exact" requirement, validated
without the 340MB OpenAI weights.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from exploremultimodal_tpu.models.dvae import (
    DalleVAE,
    DiscreteVAE,
    import_dalle_torch_state,
    map_pixels,
    unmap_pixels,
)

N_HID = 32  # small-width encoder: same topology, fast on CPU
N_BLK = 1
VOCAB = 64
GROUPS = 4


def make_torch_state(rng: np.random.Generator) -> dict[str, torch.Tensor]:
    """Random weights in the OpenAI checkpoint naming scheme."""

    def conv(n_in, n_out, k):
        w = rng.normal(0, 1 / math.sqrt(n_in * k * k), (n_out, n_in, k, k))
        return torch.tensor(w, dtype=torch.float32), torch.tensor(
            rng.normal(0, 0.1, (n_out,)), dtype=torch.float32
        )

    state = {}

    def add(name, n_in, n_out, k):
        w, b = conv(n_in, n_out, k)
        state[f"{name}.w"] = w
        state[f"{name}.b"] = b

    add("blocks.input", 3, N_HID, 7)
    widths = [1, 2, 4, 8]
    for g, mult in enumerate(widths, start=1):
        n_out = mult * N_HID
        n_prev = N_HID * (widths[g - 2] if g > 1 else 1)
        for blk in range(1, N_BLK + 1):
            n_in = n_prev if blk == 1 else n_out
            p = f"blocks.group_{g}.block_{blk}"
            if n_in != n_out:
                add(f"{p}.id_path", n_in, n_out, 1)
            n_hid = n_out // 4
            add(f"{p}.res_path.conv_1", n_in, n_hid, 3)
            add(f"{p}.res_path.conv_2", n_hid, n_hid, 3)
            add(f"{p}.res_path.conv_3", n_hid, n_hid, 3)
            add(f"{p}.res_path.conv_4", n_hid, n_out, 1)
    add("blocks.output.conv", 8 * N_HID, VOCAB, 1)
    return state


def torch_encoder_forward(state: dict, x: torch.Tensor) -> torch.Tensor:
    """Functional oracle of the encoder conv stack (NCHW)."""
    post_gain = 1.0 / (GROUPS * N_BLK) ** 2

    def conv(name, h, k):
        return F.conv2d(h, state[f"{name}.w"], state[f"{name}.b"],
                        padding=(k - 1) // 2)

    def block(prefix, h):
        idp = conv(f"{prefix}.id_path", h, 1) if f"{prefix}.id_path.w" in state else h
        r = conv(f"{prefix}.res_path.conv_1", F.relu(h), 3)
        r = conv(f"{prefix}.res_path.conv_2", F.relu(r), 3)
        r = conv(f"{prefix}.res_path.conv_3", F.relu(r), 3)
        r = conv(f"{prefix}.res_path.conv_4", F.relu(r), 1)
        return idp + post_gain * r

    h = conv("blocks.input", x, 7)
    for g in range(1, GROUPS + 1):
        for blk in range(1, N_BLK + 1):
            h = block(f"blocks.group_{g}.block_{blk}", h)
        if g < GROUPS:
            h = F.max_pool2d(h, 2)
    return conv("blocks.output.conv", F.relu(h), 1)


def build_jax_encoder(state):
    from exploremultimodal_tpu.models.dvae import DalleEncoder

    enc = DalleEncoder(n_hid=N_HID, n_blk_per_group=N_BLK, vocab_size=VOCAB)
    params = import_dalle_torch_state(state, "encoder")
    return enc, {"params": params}


def test_token_ids_bit_exact_vs_torch():
    rng = np.random.default_rng(0)
    state = make_torch_state(rng)
    enc, variables = build_jax_encoder(state)

    img = rng.random((2, 64, 64, 3)).astype(np.float32)
    img_mapped = np.asarray(map_pixels(jnp.asarray(img)))

    logits_jax = enc.apply(variables, jnp.asarray(img_mapped))
    logits_torch = torch_encoder_forward(
        state, torch.from_numpy(img_mapped).permute(0, 3, 1, 2)
    )

    lj = np.asarray(logits_jax)  # (B, 8, 8, V)
    lt = logits_torch.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(lj, lt, rtol=1e-4, atol=1e-4)

    ids_jax = lj.argmax(-1)
    ids_torch = lt.argmax(-1)
    np.testing.assert_array_equal(ids_jax, ids_torch)  # bit-exact token ids


def test_fused_encoder_blocks_match_xla_and_tokens_bit_exact():
    """The Pallas fused residual-block encoder (ops/dvae_conv.py) must agree
    with the flax/XLA encoder to fp32 tolerance, and token ids must be
    bit-exact. n_hid=128 makes every block satisfy the 128-channel DMA
    alignment so all 4 groups exercise the fused kernel (interpreted on CPU)."""
    import exploremultimodal_tpu.ops.dvae_conv as dvae_conv
    from exploremultimodal_tpu.models.dvae import DalleEncoder

    enc = DalleEncoder(n_hid=128, n_blk_per_group=1, vocab_size=16)
    img = jnp.asarray(
        np.random.default_rng(3).random((1, 32, 32, 3)), jnp.float32
    )
    params = enc.init(jax.random.key(7), img)["params"]

    n_fused = 0
    orig = dvae_conv.fused_encoder_block

    def counting(*a, **kw):
        nonlocal n_fused
        n_fused += 1
        return orig(*a, **kw)

    dvae_conv.fused_encoder_block, saved = counting, orig
    try:
        logits_fused = dvae_conv.encoder_apply_fused(
            params, img, n_blk_per_group=1
        )
    finally:
        dvae_conv.fused_encoder_block = saved
    logits_xla = enc.apply({"params": params}, img)

    assert n_fused == 4, f"expected all 4 blocks fused, got {n_fused}"
    np.testing.assert_allclose(
        np.asarray(logits_fused), np.asarray(logits_xla), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(logits_fused).argmax(-1), np.asarray(logits_xla).argmax(-1)
    )


def test_quantized_encoder_param_tree_and_token_agreement():
    """int8 trunk (ops/quant_conv.py): identical param tree to the bf16
    encoder (checkpoints/imports interchangeable), the two int8 emitters
    (direct conv vs shifted-matmul decomposition) bitwise-equal (int8
    arithmetic is exact, the dequant mults are identical), and the token
    ids in high agreement with the fp32 path on the torch-oracle weight
    fixture (the tokenizer is frozen; only argmax over the fp32 vocab
    head matters)."""
    from exploremultimodal_tpu.models.dvae import DalleEncoder

    rng = np.random.default_rng(0)
    state = make_torch_state(rng)
    params = import_dalle_torch_state(state, "encoder")
    img = map_pixels(jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32))

    kw = dict(n_hid=N_HID, n_blk_per_group=N_BLK, vocab_size=VOCAB)
    enc_f32 = DalleEncoder(**kw)
    enc_q = DalleEncoder(**kw, quantize="w8a8")
    enc_qs = DalleEncoder(**kw, quantize="w8a8_shifted")

    # identical parameter tree: the imported fp32 params drive all paths
    ref_shapes = jax.tree_util.tree_map(jnp.shape, enc_f32.init(jax.random.key(0), img)["params"])
    q_shapes = jax.tree_util.tree_map(jnp.shape, enc_q.init(jax.random.key(0), img)["params"])
    assert ref_shapes == q_shapes

    logits_f32 = np.asarray(enc_f32.apply({"params": params}, img))
    logits_q = np.asarray(enc_q.apply({"params": params}, img))
    logits_qs = np.asarray(enc_qs.apply({"params": params}, img))

    np.testing.assert_array_equal(logits_q, logits_qs)  # emitters bit-exact

    ids_f32 = logits_f32.argmax(-1).ravel()
    ids_q = logits_q.argmax(-1).ravel()
    agreement = float((ids_f32 == ids_q).mean())
    assert agreement >= 0.9, f"int8 token agreement {agreement:.3f} < 0.9"


def test_encoder_downsamples_8x_and_facade():
    vae = DalleVAE(image_size=64)
    # narrow test-sized stacks
    from exploremultimodal_tpu.models.dvae import DalleDecoder, DalleEncoder

    vae.encoder = DalleEncoder(n_hid=16, n_blk_per_group=1, vocab_size=32)
    vae.decoder = DalleDecoder(n_init=16, n_hid=16, n_blk_per_group=1, vocab_size=32)
    vae.init_random(jax.random.key(0))

    img = jnp.asarray(np.random.default_rng(1).random((2, 64, 64, 3)), jnp.float32)
    ids = vae.get_codebook_indices(map_pixels(img))
    assert ids.shape == (2, 64)  # 64/8 = 8 → 8×8 tokens
    assert ids.dtype in (jnp.int32, jnp.int64)
    assert int(ids.max()) < 32

    probs = vae.get_codebook_probs(map_pixels(img))
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-5)

    recon = vae.decode(ids)
    assert recon.shape == (2, 64, 64, 6)  # logit-Laplace (mu, log b) per channel


def test_map_unmap_pixels_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).random((4, 4, 3)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(unmap_pixels(map_pixels(x))), np.asarray(x), rtol=1e-6
    )
    # map_pixels compresses into [eps, 1-eps]
    y = np.asarray(map_pixels(x))
    assert y.min() >= 0.1 - 1e-6 and y.max() <= 0.9 + 1e-6


def test_discrete_vae_trainable():
    vae = DiscreteVAE(image_size=32, num_tokens=16, codebook_dim=8,
                      num_layers=2, hidden_dim=8)
    img = jnp.asarray(np.random.default_rng(0).random((2, 32, 32, 3)), jnp.float32)
    variables = vae.init(jax.random.key(0), img, rng=jax.random.key(1))
    recon, loss = vae.apply(variables, img, rng=jax.random.key(2))
    assert recon.shape == img.shape
    assert np.isfinite(float(loss))
    ids = vae.apply(variables, img, method=DiscreteVAE.get_codebook_indices)
    assert ids.shape == (2, (32 // 4) ** 2)  # 2 stride-2 layers → 4x downsample

    # gradient flows to the codebook through gumbel-softmax
    def loss_fn(params):
        _, l = vae.apply({"params": params}, img, rng=jax.random.key(2))
        return l

    grads = jax.grad(loss_fn)(variables["params"])
    g = np.asarray(grads["codebook"]["embedding"])
    assert np.abs(g).sum() > 0
