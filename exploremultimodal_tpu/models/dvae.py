"""DALL-E discrete VAE (dVAE) — the frozen image tokenizer for MIM.

JAX/NHWC reimplementation of the architecture the reference vendors from
OpenAI (dall_e/encoder.py, dall_e/decoder.py, models/modeling_discrete_vae.py)
plus the lucidrains-style trainable DiscreteVAE alternative
(modeling_discrete_vae.py:81-221). Capabilities:

  - Encoder: 7×7 input conv → 4 groups × n_blk_per_group bottleneck residual
    blocks (res path scaled by post_gain = 1/(total blocks)²) with 2× maxpool
    between groups (8× downsample) → ReLU → 1×1 conv to 8192 logits
    (encoder.py:50-133); token ids = argmax over the vocab channel
    (modeling_discrete_vae.py:246-248)
  - Decoder: mirror with nearest-neighbour 2× upsampling (decoder.py:50-136)
  - map_pixels / unmap_pixels logit-Laplace transform, ε = 0.1
    (dall_e/utils.py:51-65)
  - PyTorch weight importer for the published OpenAI encoder.pkl/decoder.pkl
    (token-id parity with the torch stack is exercised in
    tests/test_dvae.py against a functional torch oracle)

The tokenizer runs frozen under stop_gradient in the MIM objective; the whole
encoder compiles to one XLA program of MXU convs. For the pretrain step the
encoder input is img_size // 2 (112 → 14×14 tokens, vlmo_module.py:73); the
benchmark path tokenizes 256 → 32×32.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

LOGIT_LAPLACE_EPS = 0.1


def map_pixels(x: jax.Array) -> jax.Array:
    """[0,1] pixels → logit-Laplace domain (dall_e/utils.py:51-55)."""
    return (1 - 2 * LOGIT_LAPLACE_EPS) * x + LOGIT_LAPLACE_EPS


def unmap_pixels(x: jax.Array) -> jax.Array:
    return jnp.clip(
        (x - LOGIT_LAPLACE_EPS) / (1 - 2 * LOGIT_LAPLACE_EPS), 0.0, 1.0
    )


class _QuantConvCore(nn.Module):
    """nn.Conv's exact parameter tree (kernel HWIO + bias, lecun_normal)
    with the forward routed through the int8 MXU (ops/quant_conv.py) —
    checkpoints/imports are interchangeable with the bf16 path."""

    features: int
    kernel_size: int
    pad: int
    impl: str = "direct"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, self.kernel_size, x.shape[-1], self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        from ..ops.quant_conv import quant_conv

        y = quant_conv(x, kernel, self.pad, self.impl)
        return y + bias.astype(y.dtype)


class _Conv(nn.Module):
    """SAME-padded conv matching torch F.conv2d(padding=(kw-1)//2)."""

    features: int
    kernel: int
    dtype: Any = jnp.float32
    quantize: str = "none"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pad = (self.kernel - 1) // 2
        if self.quantize != "none":
            impl = {"w8a8": "direct", "w8a8_shifted": "shifted"}[self.quantize]
            return _QuantConvCore(
                self.features, self.kernel, pad, impl, name="conv"
            )(x.astype(self.dtype))
        return nn.Conv(
            self.features,
            kernel_size=(self.kernel, self.kernel),
            padding=[(pad, pad), (pad, pad)],
            dtype=self.dtype,
            name="conv",
        )(x)


class EncoderBlock(nn.Module):
    """Bottleneck residual block (encoder.py:14-46):
    out = id_path(x) + post_gain · conv1×1(relu→3×3→relu→3×3→relu→3×3→relu)."""

    n_out: int
    post_gain: float
    dtype: Any = jnp.float32
    quantize: str = "none"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n_hid = self.n_out // 4
        q = self.quantize
        identity = (
            _Conv(self.n_out, 1, self.dtype, q, name="id_conv")(x)
            if x.shape[-1] != self.n_out
            else x
        )
        h = _Conv(n_hid, 3, self.dtype, q, name="conv_1")(nn.relu(x))
        h = _Conv(n_hid, 3, self.dtype, q, name="conv_2")(nn.relu(h))
        h = _Conv(n_hid, 3, self.dtype, q, name="conv_3")(nn.relu(h))
        h = _Conv(self.n_out, 1, self.dtype, q, name="conv_4")(nn.relu(h))
        return identity + self.post_gain * h


class DecoderBlock(nn.Module):
    """Mirror residual block (decoder.py:14-47): res path 1×1→3×3→3×3→3×3."""

    n_out: int
    post_gain: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n_hid = self.n_out // 4
        identity = (
            _Conv(self.n_out, 1, self.dtype, name="id_conv")(x)
            if x.shape[-1] != self.n_out
            else x
        )
        h = _Conv(n_hid, 1, self.dtype, name="conv_1")(nn.relu(x))
        h = _Conv(n_hid, 3, self.dtype, name="conv_2")(nn.relu(h))
        h = _Conv(n_hid, 3, self.dtype, name="conv_3")(nn.relu(h))
        h = _Conv(self.n_out, 3, self.dtype, name="conv_4")(nn.relu(h))
        return identity + self.post_gain * h


class DalleEncoder(nn.Module):
    """OpenAI dVAE encoder; input NHWC in the logit-Laplace pixel domain."""

    group_count: int = 4
    n_hid: int = 256
    n_blk_per_group: int = 2
    vocab_size: int = 8192
    dtype: Any = jnp.float32
    # "w8a8"/"w8a8_shifted": trunk convs on the int8 MXU (ops/quant_conv.py);
    # the final fp32 vocab projection is never quantized (argmax stability)
    quantize: str = "none"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n_layers = self.group_count * self.n_blk_per_group
        post_gain = 1.0 / n_layers**2

        x = _Conv(self.n_hid, 7, self.dtype, self.quantize,
                  name="input_conv")(x)
        widths = (1, 2, 4, 8)
        for g, mult in enumerate(widths, start=1):
            for b in range(1, self.n_blk_per_group + 1):
                x = EncoderBlock(
                    mult * self.n_hid, post_gain, self.dtype, self.quantize,
                    name=f"group_{g}_block_{b}",
                )(x)
            if g < len(widths):
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(x)
        # final projection kept fp32 (reference: use_float16=False on the
        # output conv, encoder.py:115-119) for stable argmax tie-breaks
        return _Conv(self.vocab_size, 1, jnp.float32, name="output_conv")(
            x.astype(jnp.float32)
        )


class DalleDecoder(nn.Module):
    """OpenAI dVAE decoder: one-hot codes (NHWC, C=vocab) → logit-Laplace stats."""

    group_count: int = 4
    n_init: int = 128
    n_hid: int = 256
    n_blk_per_group: int = 2
    output_channels: int = 3
    vocab_size: int = 8192
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        n_layers = self.group_count * self.n_blk_per_group
        post_gain = 1.0 / n_layers**2

        x = _Conv(self.n_init, 1, jnp.float32, name="input_conv")(z)
        widths = (8, 4, 2, 1)
        for g, mult in enumerate(widths, start=1):
            for b in range(1, self.n_blk_per_group + 1):
                x = DecoderBlock(
                    mult * self.n_hid, post_gain, self.dtype,
                    name=f"group_{g}_block_{b}",
                )(x)
            if g < len(widths):
                B, H, W, C = x.shape
                x = jax.image.resize(x, (B, 2 * H, 2 * W, C), method="nearest")
        x = nn.relu(x)
        return _Conv(2 * self.output_channels, 1, jnp.float32, name="output_conv")(
            x.astype(jnp.float32)
        )


class DalleVAE:
    """Frozen tokenizer façade (Dalle_VAE, modeling_discrete_vae.py:224-270).

    `fused=True` routes the encoder through the Pallas fused residual-block
    kernels (ops/dvae_conv.py); both paths are numerically identical
    (tests/test_dvae.py fused-parity test). Default is the XLA conv path:
    measured on TPU v5e at the 256² bench shape (chained on-device loop,
    BENCH.md round 2), XLA's conv emitter beats the hand-fused kernel ~2.2×
    in both fp32 (25.4 vs 59.9 ms/b8) and bf16 (22.3 vs 47.4 ms/b8) — the
    small-channel bottleneck convs underfill the MXU as shifted matmuls."""

    def __init__(self, image_size: int, encoder_params=None, decoder_params=None,
                 dtype: Any = jnp.float32, fused: bool = False,
                 quantize: str = "none"):
        if fused and quantize != "none":
            raise ValueError("fused Pallas and int8 encoder paths are exclusive")
        self.image_size = image_size
        self.encoder = DalleEncoder(dtype=dtype, quantize=quantize)
        self.decoder = DalleDecoder(dtype=dtype)
        self.encoder_params = encoder_params
        self.decoder_params = decoder_params
        self.fused = fused

    def init_random(self, rng: jax.Array) -> None:
        """Random weights (for tests / before importing OpenAI weights)."""
        r1, r2 = jax.random.split(rng)
        dummy = jnp.zeros((1, self.image_size, self.image_size, 3))
        self.encoder_params = self.encoder.init(r1, dummy)["params"]
        grid = self.image_size // 8
        dummy_z = jnp.zeros((1, grid, grid, self.encoder.vocab_size))
        self.decoder_params = self.decoder.init(r2, dummy_z)["params"]

    def _encode(self, images: jax.Array) -> jax.Array:
        if self.fused:
            from ..ops.dvae_conv import encoder_apply_fused

            return encoder_apply_fused(
                self.encoder_params, images,
                dtype=self.encoder.dtype,
                group_count=self.encoder.group_count,
                n_blk_per_group=self.encoder.n_blk_per_group,
            )
        return self.encoder.apply({"params": self.encoder_params}, images)

    def get_codebook_indices(self, images: jax.Array) -> jax.Array:
        """NHWC logit-Laplace images → (B, H/8 · W/8) int32 token ids."""
        logits = self._encode(images)
        ids = jnp.argmax(logits, axis=-1)
        return ids.reshape(ids.shape[0], -1)

    def get_codebook_probs(self, images: jax.Array) -> jax.Array:
        logits = self._encode(images)
        return jax.nn.softmax(logits, axis=-1)

    def decode(self, img_seq: jax.Array) -> jax.Array:
        B, N = img_seq.shape
        grid = int(np.sqrt(N))
        one_hot = jax.nn.one_hot(
            img_seq.reshape(B, grid, grid), self.encoder.vocab_size
        )
        return self.decoder.apply({"params": self.decoder_params}, one_hot)


# ------------------------------------------------------------------ importer


def _torch_conv_to_flax(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # (O, I, kh, kw) → (kh, kw, I, O)


def import_dalle_torch_state(state: dict, module: str = "encoder") -> dict:
    """Map an OpenAI dall_e torch state_dict to the flax param tree.

    Torch names (vendored layout, dall_e/encoder.py:74-121):
      blocks.input.{w,b}                          → input_conv.conv
      blocks.group_{g}.block_{b}.id_path.{w,b}    → group_{g}_block_{b}.id_conv.conv
      blocks.group_{g}.block_{b}.res_path.conv_{k}.{w,b}
                                                  → group_{g}_block_{b}.conv_{k}.conv
      blocks.output.conv.{w,b}                    → output_conv.conv
    Accepts torch tensors or numpy arrays as values.
    """
    del module  # same naming scheme for encoder and decoder
    params: dict = {}

    def put(path: list[str], kernel: np.ndarray, bias: np.ndarray) -> None:
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = {
            "kernel": jnp.asarray(_torch_conv_to_flax(kernel)),
            "bias": jnp.asarray(bias),
        }

    def to_np(v) -> np.ndarray:
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    weights = {k: to_np(v) for k, v in state.items()}
    for name, w in weights.items():
        if not name.endswith(".w"):
            continue
        b = weights[name[:-2] + ".b"]
        parts = name.split(".")
        if parts[1] == "input":
            put(["input_conv", "conv"], w, b)
        elif parts[1] == "output":
            put(["output_conv", "conv"], w, b)
        else:
            g = parts[1].split("_")[1]
            blk = parts[2].split("_")[1]
            leaf = "id_conv" if parts[3] == "id_path" else parts[4]
            put([f"group_{g}_block_{blk}", leaf, "conv"], w, b)
    return params


def load_dalle_vae(weight_dir: str, image_size: int) -> DalleVAE:
    """Load OpenAI encoder.pkl / decoder.pkl (pickled torch modules or state
    dicts) into the JAX tokenizer. Requires torch for unpickling only."""
    import os

    import torch

    vae = DalleVAE(image_size)
    for part in ("encoder", "decoder"):
        path = os.path.join(weight_dir, f"{part}.pkl")
        obj = torch.load(path, map_location="cpu", weights_only=False)
        state = obj if isinstance(obj, dict) else obj.state_dict()
        params = import_dalle_torch_state(state, part)
        setattr(vae, f"{part}_params", params)
    return vae


# --------------------------------------------------- trainable DiscreteVAE


class DiscreteVAE(nn.Module):
    """lucidrains-style trainable dVAE (modeling_discrete_vae.py:81-221):
    num_layers stride-2 conv stages + residual blocks, gumbel-softmax codes."""

    image_size: int = 256
    num_tokens: int = 8192
    codebook_dim: int = 512
    num_layers: int = 3
    hidden_dim: int = 64
    channels: int = 3
    temperature: float = 0.9
    straight_through: bool = False
    dtype: Any = jnp.float32

    def setup(self) -> None:
        self.codebook = nn.Embed(self.num_tokens, self.codebook_dim)
        enc, dec = [], []
        for i in range(self.num_layers):
            enc.append(
                nn.Conv(self.hidden_dim, (4, 4), strides=(2, 2), padding=1,
                        dtype=self.dtype)
            )
            dec.append(
                nn.ConvTranspose(self.hidden_dim, (4, 4), strides=(2, 2),
                                 padding="SAME", dtype=self.dtype)
            )
        self.enc_convs = enc
        self.dec_convs = dec
        self.enc_res = [
            _ResBlock(self.hidden_dim, self.dtype) for _ in range(self.num_layers)
        ]
        self.dec_res = [
            _ResBlock(self.hidden_dim, self.dtype) for _ in range(self.num_layers)
        ]
        self.to_logits = nn.Conv(self.num_tokens, (1, 1), dtype=jnp.float32)
        self.to_pixels = nn.Conv(self.channels, (1, 1), dtype=jnp.float32)

    def encode_logits(self, img: jax.Array) -> jax.Array:
        x = img.astype(self.dtype)
        for conv, res in zip(self.enc_convs, self.enc_res):
            x = nn.relu(conv(x))
            x = res(x)
        return self.to_logits(x.astype(jnp.float32))

    def decode_codes(self, codes: jax.Array) -> jax.Array:
        x = codes.astype(self.dtype)
        for conv, res in zip(self.dec_convs, self.dec_res):
            x = nn.relu(conv(x))
            x = res(x)
        return self.to_pixels(x.astype(jnp.float32))

    def get_codebook_indices(self, img: jax.Array) -> jax.Array:
        ids = jnp.argmax(self.encode_logits(img), axis=-1)
        return ids.reshape(ids.shape[0], -1)

    def __call__(self, img: jax.Array, rng: jax.Array | None = None,
                 temp: float | None = None):
        """Returns (reconstruction, recon_loss)."""
        logits = self.encode_logits(img)
        temp = temp if temp is not None else self.temperature
        if rng is not None:
            g = -jnp.log(-jnp.log(jax.random.uniform(rng, logits.shape) + 1e-20)
                         + 1e-20)
            soft = jax.nn.softmax((logits + g) / temp, axis=-1)
        else:
            soft = jax.nn.softmax(logits / temp, axis=-1)
        if self.straight_through:
            hard = jax.nn.one_hot(jnp.argmax(soft, -1), self.num_tokens)
            soft = hard + soft - jax.lax.stop_gradient(soft)
        codes = soft @ self.codebook.embedding
        recon = self.decode_codes(codes)
        loss = jnp.mean((recon - img) ** 2)
        return recon, loss


class _ResBlock(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.relu(nn.Conv(self.dim, (3, 3), padding=1, dtype=self.dtype)(x))
        h = nn.relu(nn.Conv(self.dim, (3, 3), padding=1, dtype=self.dtype)(h))
        h = nn.Conv(self.dim, (1, 1), dtype=self.dtype)(h)
        return h + x


def create_d_vae(weight_path: str, d_vae_type: str, image_size: int,
                 dtype: Any = jnp.float32, quantize: str = "none"):
    """Tokenizer factory (objectives.py:595-628). dtype=bfloat16 halves the
    conv-stack HBM traffic for the training path; the token-parity benchmark
    path must use float32 (argmax tie-breaks). quantize="w8a8" runs the
    trunk convs on the int8 MXU (train.discrete_vae_quantize)."""
    if d_vae_type == "dall-e":
        vae = load_dalle_vae(weight_path, image_size)
        vae.encoder = vae.encoder.clone(dtype=dtype, quantize=quantize)
        vae.decoder = vae.decoder.clone(dtype=dtype)
        return vae
    if d_vae_type == "random":  # untrained tokenizer for tests/smoke runs
        vae = DalleVAE(image_size, dtype=dtype, quantize=quantize)
        vae.init_random(jax.random.key(0))
        return vae
    raise NotImplementedError(d_vae_type)
