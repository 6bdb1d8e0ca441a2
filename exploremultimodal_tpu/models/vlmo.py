"""VLMo mixture-of-modality-experts backbone, TPU-native.

Capability parity with the reference backbone (models/vlmo/vlmo.py): a single
transformer shared by image / text / fused streams where each block has ONE
shared multi-head self-attention and THREE modality-routed dense FFN experts
('v' vision, 'l' language, 'vl' fused) selected by a trace-time `route`
(vlmo.py:141-157,187-197). Routing is a static per-stream choice — no
token-level dispatch — so each route compiles to a plain dense matmul chain
that XLA maps straight onto the MXU.

Numerics mirrored for checkpoint/logit parity:
  - attention with separate q/v bias, k bias fixed at zero (BEiT-style,
    vlmo.py:56-75), additive −inf key-padding mask, fp32 softmax
  - LayerScale gamma_1/gamma_2 (+ DropPath) residual scaling (vlmo.py:158-196)
  - image embed: 16×16 conv patchify + img_cls_token + learned pos_embed +
    token-type embedding (idx 1, or 2 for NLVR2's second image) + BEiT
    mask-token substitution at bool_masked_pos (vlmo.py:298-319)
  - text embed: BERT embeddings (word + position + BERT-internal token type 0,
    LayerNorm eps 1e-12, dropout) plus the shared token-type embedding idx 0
    (vlmo.py:321-324)
  - fused stream: routes v/l separately through blocks[:fusion_layer], concat
    [txt, img] along sequence, route 'vl' through the rest (vlmo.py:389-414)
  - BertPooler over token 0 (vlmo.py:290)

Differences by design (TPU-first): NHWC image layout, bf16 compute / fp32
params policy, attention via ops.multi_head_attention ('xla' or Pallas
flash kernel), expert presence per block configured statically instead of
post-hoc module deletion (reference `_freeze_params`, vlmo_module.py:148-167).
"""

from __future__ import annotations

from typing import Any, Sequence

import os

import flax.linen as nn
import jax
import jax.numpy as jnp

from exploremultimodal_tpu.ops import FastDropout, drop_path, multi_head_attention
from exploremultimodal_tpu.ops.attention import key_padding_bias
from exploremultimodal_tpu.ops.quant import dense as q_dense, site_mode

ROUTES = ("v", "l", "vl")

Dtype = Any


class Mlp(nn.Module):
    """Transformer FFN expert (timm-Mlp semantics: fc1→gelu→drop→fc2→drop)."""

    hidden_dim: int
    out_dim: int
    drop_rate: float = 0.0
    dtype: Dtype = jnp.float32
    quantize: str = "none"
    mlp_impl: str = "xla"  # "fused": bf16 whole-MLP Pallas kernel

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        mode = site_mode(self.quantize, "mlp")
        if self.mlp_impl == "fused" and mode == "none":
            from exploremultimodal_tpu.ops import mlp_pallas

            if mlp_pallas.fits_vmem(x.shape[-1], self.hidden_dim,
                                    self.out_dim):
                # bf16 whole-MLP fusion: both dots as dedicated Pallas
                # matmuls with the (M, hidden) intermediate held in VMEM
                # and gelu(+hidden dropout) in the kernel (mlp_pallas.py;
                # same param tree as the fc1/fc2 path below)
                from exploremultimodal_tpu.ops.quant import DenseParams

                w1, b1 = DenseParams(self.hidden_dim, name="fc1")(
                    x.shape[-1])
                w2, b2 = DenseParams(self.out_dim, name="fc2")(
                    self.hidden_dim)
                interp = jax.default_backend() == "cpu"
                threshold = (
                    int(round(self.drop_rate * 65536.0))
                    if (not deterministic) and self.drop_rate > 0.0
                    else 0
                )
                if threshold > 0:
                    bits = jax.random.bits(
                        self.make_rng("dropout"),
                        x.shape[:-1] + (self.hidden_dim,),
                        jnp.uint16,
                    )
                    y = mlp_pallas.fused_bf16_mlp_dropout(
                        x.astype(self.dtype), w1, b1, w2, b2, bits,
                        threshold, interp,
                    )
                else:
                    y = mlp_pallas.fused_bf16_mlp(
                        x.astype(self.dtype), w1, b1, w2, b2, interp
                    )
                return FastDropout(
                    self.drop_rate, deterministic=deterministic)(y)
        if mode == "w8a8_pallas":
            # whole-MLP fusion: both dots on the int8 MXU with the hidden
            # activation held in VMEM (never hits HBM), gelu in the kernel
            # epilogue, and the hidden dropout applied IN-kernel from
            # uint16 RBG bits (FastDropout's integer-threshold semantics) —
            # ops/quant_pallas.py. Param tree is identical to the fc1/fc2
            # Dense path below; the post-fc2 dropout stays outside.
            from exploremultimodal_tpu.ops.quant import DenseParams
            from exploremultimodal_tpu.ops.quant_pallas import (
                fused_w8a8_mlp,
                fused_w8a8_mlp_dropout,
            )

            w1, b1 = DenseParams(self.hidden_dim, name="fc1")(x.shape[-1])
            w2, b2 = DenseParams(self.out_dim, name="fc2")(self.hidden_dim)
            interp = jax.default_backend() == "cpu"
            threshold = (
                int(round(self.drop_rate * 65536.0))
                if (not deterministic) and self.drop_rate > 0.0
                else 0
            )
            if threshold > 0:
                bits = jax.random.bits(
                    self.make_rng("dropout"),
                    x.shape[:-1] + (self.hidden_dim,),
                    jnp.uint16,
                )
                y = fused_w8a8_mlp_dropout(
                    x.astype(self.dtype), w1, b1, w2, b2, bits, threshold,
                    interp,
                )
            else:
                y = fused_w8a8_mlp(
                    x.astype(self.dtype), w1, b1, w2, b2, interp
                )
            return FastDropout(self.drop_rate, deterministic=deterministic)(y)
        x = q_dense(mode, self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = FastDropout(self.drop_rate, deterministic=deterministic)(x)
        if os.environ.get("EMM_MLP_BARRIER", "") == "1":
            # Negative-result A/B knob (BENCH.md r4 "MLP fusion barrier"):
            # at (B·L)=50k fwd shapes XLA nests fc1's matmul inside fc2's
            # fusion as a recomputed kOutput producer (+ residual + next-LN
            # stats) at ~56 TFLOP/s vs ~170 for clean qkv dots — but
            # splitting it with this barrier is a WASH on bert_mlm
            # (130.99 vs 129.42 ms) and -1.4% on the headline step: the
            # standalone fc1 + materialized hidden costs what the split
            # saves. Kept as the measured knob; default off.
            x = jax.lax.optimization_barrier(x)
        x = q_dense(mode, self.out_dim, dtype=self.dtype, name="fc2")(x)
        x = FastDropout(self.drop_rate, deterministic=deterministic)(x)
        return x


class Attention(nn.Module):
    """Shared MHSA with separate q/v bias and zero k bias (vlmo.py:39-98)."""

    dim: int
    num_heads: int
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.float32
    impl: str = "xla"
    quantize: str = "none"

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        bias: jax.Array | None = None,
        deterministic: bool = True,
    ) -> jax.Array:
        B, N, C = x.shape
        head_dim = self.dim // self.num_heads

        qkv = q_dense(
            site_mode(self.quantize, "qkv"), 3 * self.dim, use_bias=False,
            dtype=self.dtype, name="qkv",
        )(x)
        q_bias = self.param("q_bias", nn.initializers.zeros, (self.dim,))
        v_bias = self.param("v_bias", nn.initializers.zeros, (self.dim,))

        qkv = qkv.reshape(B, N, 3, self.num_heads, head_dim)
        q, k, v = (
            jnp.moveaxis(qkv[:, :, i], 1, 2) for i in range(3)
        )  # each (B, H, N, Dh)
        # bias AFTER the head split: same values as adding the concatenated
        # (q_bias ‖ 0 ‖ v_bias) to the packed (B, N, 3C) tensor, but k needs
        # no add at all and the q/v adds fuse into the split/transpose
        # fusions instead of a separate (B, N, 3C) elementwise pass
        # (~4 ms/step of the headline profile, BENCH.md round 3)
        q = q + q_bias.reshape(self.num_heads, 1, head_dim).astype(q.dtype)
        v = v + v_bias.reshape(self.num_heads, 1, head_dim).astype(v.dtype)

        out = multi_head_attention(
            q, k, v,
            bias=bias,
            scale=head_dim**-0.5,
            dropout_rate=self.attn_drop,
            dropout_rng=(
                self.make_rng("dropout")
                if (self.attn_drop > 0 and not deterministic)
                else None
            ),
            deterministic=deterministic,
            impl=self.impl,
        )
        out = jnp.moveaxis(out, 1, 2).reshape(B, N, C)
        out = q_dense(site_mode(self.quantize, "proj"), self.dim,
                      dtype=self.dtype, name="proj")(out)
        out = FastDropout(self.proj_drop, deterministic=deterministic)(out)
        return out


class Block(nn.Module):
    """Pre-LN block: shared attention + routed FFN experts + LayerScale.

    x += DropPath(γ₁ · Attn(LN₁ x)); x += DropPath(γ₂ · MLP[route](LN₂ x))
    (vlmo.py:187-197). `experts` lists which FFN experts exist in this block —
    the static equivalent of the reference's `del b.mlp.vl` surgery.
    """

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path_rate: float = 0.0
    init_values: float | None = None
    norm_eps: float = 1e-12
    experts: Sequence[str] = ROUTES
    dtype: Dtype = jnp.float32
    attn_impl: str = "xla"
    quantize: str = "none"
    mlp_impl: str = "xla"

    def setup(self) -> None:
        self.norm1 = nn.LayerNorm(epsilon=self.norm_eps, dtype=jnp.float32)
        self.attn = Attention(
            dim=self.dim,
            num_heads=self.num_heads,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            dtype=self.dtype,
            impl=self.attn_impl,
            quantize=self.quantize,
        )
        self.norm2 = nn.LayerNorm(epsilon=self.norm_eps, dtype=jnp.float32)
        hidden = int(self.dim * self.mlp_ratio)
        for route in self.experts:
            setattr(
                self,
                f"mlp_{route}",
                Mlp(
                    hidden_dim=hidden,
                    out_dim=self.dim,
                    drop_rate=self.drop,
                    dtype=self.dtype,
                    quantize=self.quantize,
                    mlp_impl=self.mlp_impl,
                ),
            )
        if self.init_values is not None and self.init_values > 0:
            init = nn.initializers.constant(self.init_values)
            self.gamma_1 = self.param("gamma_1", init, (self.dim,))
            self.gamma_2 = self.param("gamma_2", init, (self.dim,))
        else:
            self.gamma_1 = self.gamma_2 = None

    def __call__(
        self,
        x: jax.Array,
        bias: jax.Array | None,
        route: str,
        deterministic: bool = True,
    ) -> jax.Array:
        if route not in self.experts:
            raise ValueError(f"route {route!r} not among experts {self.experts}")

        def residual(branch: jax.Array, gamma) -> jax.Array:
            if gamma is not None:
                branch = branch * gamma.astype(branch.dtype)
            rng = (
                self.make_rng("droppath")
                if (self.drop_path_rate > 0 and not deterministic)
                else None
            )
            return drop_path(branch, self.drop_path_rate, rng, deterministic)

        attn_out = self.attn(
            self.norm1(x).astype(self.dtype), bias=bias, deterministic=deterministic
        )
        x = x + residual(attn_out, self.gamma_1)
        mlp = getattr(self, f"mlp_{route}")
        mlp_out = mlp(self.norm2(x).astype(self.dtype), deterministic=deterministic)
        x = x + residual(mlp_out, self.gamma_2)
        return x


class BertTextEmbeddings(nn.Module):
    """HF BertEmbeddings semantics (word + position + token-type 0 → LN → drop)."""

    vocab_size: int
    dim: int
    max_len: int
    drop_rate: float = 0.0
    norm_eps: float = 1e-12
    dtype: Dtype = jnp.float32

    def setup(self) -> None:
        self.word_embeddings = nn.Embed(self.vocab_size, self.dim)
        self.position_embeddings = nn.Embed(self.max_len, self.dim)
        self.token_type_embeddings = nn.Embed(2, self.dim)
        self.LayerNorm = nn.LayerNorm(epsilon=self.norm_eps, dtype=jnp.float32)
        self.dropout = FastDropout(self.drop_rate)

    def __call__(self, ids: jax.Array, deterministic: bool = True) -> jax.Array:
        positions = jnp.arange(ids.shape[1])[None, :]
        x = (
            self.word_embeddings(ids)
            + self.position_embeddings(positions)
            + self.token_type_embeddings(jnp.zeros_like(ids))
        )
        x = self.LayerNorm(x)
        x = self.dropout(x, deterministic=deterministic)
        return x.astype(self.dtype)

    def attend(self, x: jax.Array) -> jax.Array:
        """x @ word_embeddingᵀ — the tied MLM decoder matmul."""
        return self.word_embeddings.attend(x)


class Pooler(nn.Module):
    """BertPooler: dense+tanh over token 0 (vlmo.py:290, used at vlmo_module.py:379)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return jnp.tanh(nn.Dense(self.dim, dtype=self.dtype, name="dense")(x[:, 0]))


def build_2d_sincos_position_embedding(
    grid_size: int, embed_dim: int, temperature: float = 10000.0
) -> jax.Array:
    """Fixed 2-D sin-cos positional embedding incl. a zero [CLS] row
    (MoCo-v3-style; the reference carries an unused builder at
    vlmo.py:455-477 — here it is a usable option: pass the result as
    `pos_embed` via parameter surgery or freeze it with a 0x LR multiplier)."""
    import numpy as np

    if embed_dim % 4 != 0:
        raise ValueError("embed_dim must be divisible by 4 for 2D sin-cos")
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid_h = np.arange(grid_size, dtype=np.float32)
    gw, gh = np.meshgrid(grid_w, grid_h, indexing="ij")
    pos_dim = embed_dim // 4
    omega = 1.0 / temperature ** (np.arange(pos_dim, dtype=np.float32) / pos_dim)
    out_w = np.einsum("m,d->md", gw.flatten(), omega)
    out_h = np.einsum("m,d->md", gh.flatten(), omega)
    pe = np.concatenate(
        [np.sin(out_w), np.cos(out_w), np.sin(out_h), np.cos(out_h)], axis=1
    )[None]
    cls_row = np.zeros((1, 1, embed_dim), np.float32)
    return jnp.asarray(np.concatenate([cls_row, pe], axis=1))


def expert_layout(
    depth: int, fusion_layer: int, phase: str | None
) -> tuple[tuple[str, ...], ...]:
    """Which FFN experts exist per block for a train phase.

    Static equivalent of the reference's parameter surgery
    (vlmo_module.py:148-167): pretrain_txt drops 'vl' everywhere;
    pretrain_mum / finetune phases drop 'vl' below the fusion layer.
    """
    if phase in ("pretrain_txt",):
        return tuple(("v", "l") for _ in range(depth))
    if phase in ("pretrain_mum", "finetune_vqa"):
        return tuple(
            ("v", "l") if i < fusion_layer else ROUTES for i in range(depth)
        )
    return tuple(ROUTES for _ in range(depth))


class VLMO(nn.Module):
    """The shared-attention, modality-routed-FFN transformer."""

    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    norm_eps: float = 1e-12
    init_values: float | None = None
    vocab_size: int = 30522
    max_text_len: int = 40
    fusion_layer: int = 6
    num_token_types: int = 2  # 3 for NLVR2 (image_token_type_idx 2)
    experts_per_block: tuple[tuple[str, ...], ...] | None = None
    dtype: Dtype = jnp.float32
    attn_impl: str = "xla"
    remat: bool | str = False
    quantize: str = "none"  # "w8a8" routes backbone dots to the int8 MXU
    mlp_impl: str = "xla"  # "fused": bf16 whole-MLP Pallas kernel

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    def setup(self) -> None:
        self.patch_embed = nn.Conv(
            self.embed_dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
        )
        trunc02 = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)
        self.pos_embed = self.param(
            "pos_embed", trunc02, (1, self.num_patches + 1, self.embed_dim)
        )
        self.img_cls_token = self.param(
            "img_cls_token", trunc02, (1, 1, self.embed_dim)
        )
        self.img_mask_token = self.param(
            "img_mask_token", nn.initializers.zeros, (1, 1, self.embed_dim)
        )
        self.token_type_embeddings = nn.Embed(
            self.num_token_types, self.embed_dim
        )
        self.txt_embeddings = BertTextEmbeddings(
            vocab_size=self.vocab_size,
            dim=self.embed_dim,
            max_len=self.max_text_len,
            drop_rate=self.drop_rate,
            norm_eps=self.norm_eps,
            dtype=self.dtype,
        )

        layout = self.experts_per_block or tuple(ROUTES for _ in range(self.depth))
        import numpy as np

        dpr = [float(x) for x in np.linspace(0.0, self.drop_path_rate, self.depth)]
        # rematerialization (jax.checkpoint over each block):
        #   true   — save only block inputs, recompute everything in the
        #            backward (the FSDP preset's memory lever)
        #   'dots' — selective: save matmul outputs, recompute only the
        #            elementwise chains (LN/GELU/dropout-apply) in the
        #            backward — trades cheap VPU recompute for not storing
        #            the (B, N, 4·D) MLP hiddens between fwd and bwd
        if self.remat == "dots":
            block_cls = nn.remat(
                Block,
                static_argnums=(3, 4),
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            )
        elif self.remat:
            block_cls = nn.remat(Block, static_argnums=(3, 4))
        else:
            block_cls = Block
        self.blocks = [
            block_cls(
                dim=self.embed_dim,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                drop=self.drop_rate,
                attn_drop=self.attn_drop_rate,
                drop_path_rate=dpr[i],
                init_values=self.init_values,
                norm_eps=self.norm_eps,
                experts=layout[i],
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                quantize=self.quantize,
                mlp_impl=self.mlp_impl,
            )
            for i in range(self.depth)
        ]
        self.norm = nn.LayerNorm(epsilon=self.norm_eps, dtype=jnp.float32)
        self.pooler = Pooler(self.embed_dim, dtype=self.dtype)
        self.pos_drop = FastDropout(self.drop_rate)

    # ------------------------------------------------------------------ embed

    def embed_img(
        self,
        img: jax.Array,  # (B, H, W, C) NHWC
        bool_masked_pos: jax.Array | None = None,  # (B, num_patches)
        img_token_type_idx: int = 1,
        deterministic: bool = True,
    ) -> jax.Array:
        x = self.patch_embed(img.astype(self.dtype))
        B = x.shape[0]
        x = x.reshape(B, self.num_patches, self.embed_dim)

        if bool_masked_pos is not None:
            w = bool_masked_pos[..., None].astype(x.dtype)
            x = x * (1.0 - w) + self.img_mask_token.astype(x.dtype) * w

        cls = jnp.broadcast_to(
            self.img_cls_token.astype(x.dtype), (B, 1, self.embed_dim)
        )
        x = jnp.concatenate([cls, x], axis=1)
        x = x + self.pos_embed.astype(x.dtype)
        x = self.pos_drop(x, deterministic=deterministic)
        tt = self.token_type_embeddings(
            jnp.full((B, x.shape[1]), img_token_type_idx, dtype=jnp.int32)
        )
        return x + tt.astype(x.dtype)

    def embed_txt(self, ids: jax.Array, deterministic: bool = True) -> jax.Array:
        x = self.txt_embeddings(ids, deterministic=deterministic)
        tt = self.token_type_embeddings(jnp.zeros_like(ids))
        return x + tt.astype(x.dtype)

    # ------------------------------------------------------------------ blocks

    def run_blocks(
        self,
        x: jax.Array,
        mask: jax.Array | None,
        route: str,
        in_layer: int = 0,
        out_layer: int | None = None,
        deterministic: bool = True,
    ) -> jax.Array:
        bias = key_padding_bias(mask)
        for blk in self.blocks[in_layer:out_layer]:
            x = blk(x, bias, route, deterministic)
        return x

    def forward_interval(
        self,
        x: jax.Array,
        mask: jax.Array | None = None,
        route: str = "v",
        need_embed: bool = False,
        bool_masked_pos: jax.Array | None = None,
        in_layer: int = 0,
        out_layer: int | None = None,
        img_token_type_idx: int = 1,
        need_norm: bool = False,
        deterministic: bool = True,
    ) -> jax.Array:
        """Run an arbitrary block slice on one route (vlmo.py:326-355);
        used by MIM with mim_head_pos='fusion'."""
        if need_embed:
            if route == "v":
                x = self.embed_img(
                    x, bool_masked_pos, img_token_type_idx, deterministic
                )
            elif route == "l":
                x = self.embed_txt(x, deterministic)
        x = self.run_blocks(x, mask, route, in_layer, out_layer, deterministic)
        return self.norm(x).astype(self.dtype) if need_norm else x

    # ------------------------------------------------------------ full forward

    def forward_features(
        self,
        img: jax.Array | None = None,
        txt: jax.Array | None = None,
        txt_mask: jax.Array | None = None,
        bool_masked_pos: jax.Array | None = None,
        fusion_layer: int | None = None,
        img_token_type_idx: int = 1,
        deterministic: bool = True,
    ) -> tuple[jax.Array, jax.Array | None]:
        """Single / dual-stream forward (vlmo.py:357-414).

        img-only → route 'v' through all blocks; txt-only → route 'l';
        both → dual streams below fusion_layer, then concat [txt, img] and
        route 'vl'. Returns (features, attention_mask). Image attention masks
        are all-ones (reference infer always passes def_attn_masks,
        vlmo_module.py:349-354).
        """
        if img is not None:
            B = img.shape[0]
            img_mask = jnp.ones((B, self.num_patches + 1), dtype=jnp.int32)

        if txt is None:
            x = self.embed_img(
                img, bool_masked_pos, img_token_type_idx, deterministic
            )
            x = self.run_blocks(x, img_mask, "v", deterministic=deterministic)
            return self.norm(x).astype(self.dtype), img_mask

        if img is None:
            x = self.embed_txt(txt, deterministic)
            x = self.run_blocks(x, txt_mask, "l", deterministic=deterministic)
            return self.norm(x).astype(self.dtype), txt_mask

        fusion = fusion_layer if fusion_layer is not None else self.fusion_layer
        img_x = self.embed_img(img, bool_masked_pos, img_token_type_idx, deterministic)
        txt_x = self.embed_txt(txt, deterministic)

        img_bias = key_padding_bias(img_mask)
        txt_bias = key_padding_bias(txt_mask)
        for blk in self.blocks[:fusion]:
            img_x = blk(img_x, img_bias, "v", deterministic)
            txt_x = blk(txt_x, txt_bias, "l", deterministic)

        co = jnp.concatenate([txt_x, img_x], axis=1)
        co_mask = jnp.concatenate([txt_mask, img_mask], axis=1)
        co_bias = key_padding_bias(co_mask)
        for blk in self.blocks[fusion:]:
            co = blk(co, co_bias, "vl", deterministic)
        return self.norm(co).astype(self.dtype), co_mask

    def stream_below_fusion(
        self,
        img: jax.Array | None = None,
        txt: jax.Array | None = None,
        txt_mask: jax.Array | None = None,
        deterministic: bool = True,
    ) -> jax.Array:
        """Embed one modality and run blocks[:fusion_layer] on its route.
        The single-modality half of the dual-stream forward, exposed so
        callers can deduplicate repeated inputs (ITM forwards the same image
        with several texts — the image stream below fusion is text-
        independent, so it is computed once per unique image and the hidden
        states gathered per pair; the reference recomputes it 3× per step)."""
        if img is not None:
            x = self.embed_img(img, deterministic=deterministic)
            mask = jnp.ones((img.shape[0], self.num_patches + 1), jnp.int32)
            route = "v"
        else:
            x = self.embed_txt(txt, deterministic)
            mask, route = txt_mask, "l"
        return self.run_blocks(
            x, mask, route, 0, self.fusion_layer, deterministic
        )

    def continue_single_stream(
        self,
        x: jax.Array,
        mask: jax.Array | None,
        route: str,
        deterministic: bool = True,
    ) -> jax.Array:
        """Run blocks[fusion_layer:] on a single-modality hidden state + the
        final norm — the upper half of a full-depth single stream. Lets ITC
        continue from the same below-fusion hidden states that ITM and MLM
        consume, so the 2·bs single-modality streams below the fusion layer
        are computed ONCE per step instead of once per objective (the
        reference recomputes them per compute_* call, objectives.py:117,288)."""
        x = self.run_blocks(
            x, mask, route, self.fusion_layer, None, deterministic
        )
        return self.norm(x).astype(self.dtype)

    def fuse_from_hidden(
        self,
        img_hidden: jax.Array,
        txt_hidden: jax.Array,
        txt_mask: jax.Array,
        deterministic: bool = True,
    ) -> tuple[jax.Array, jax.Array]:
        """Concat pre-fused hidden states and run blocks[fusion_layer:]
        (the tail of forward_features' dual-stream branch)."""
        B = img_hidden.shape[0]
        img_mask = jnp.ones((B, img_hidden.shape[1]), jnp.int32)
        co = jnp.concatenate([txt_hidden, img_hidden], axis=1)
        co_mask = jnp.concatenate([txt_mask, img_mask], axis=1)
        co_bias = key_padding_bias(co_mask)
        for blk in self.blocks[self.fusion_layer:]:
            co = blk(co, co_bias, "vl", deterministic)
        return self.norm(co).astype(self.dtype), co_mask

    def pool(self, co_feats: jax.Array) -> jax.Array:
        return self.pooler(co_feats)

    def attend_vocab(self, x: jax.Array) -> jax.Array:
        """Tied word-embedding decoder (MLMHead weight tying,
        heads.py:95-96)."""
        return self.txt_embeddings.attend(x)

    def init_streams(self, img: jax.Array, txt: jax.Array, txt_mask: jax.Array):
        """Trace every route the expert layout supports so init materializes
        the full parameter tree (single-route traces would only create the
        experts they touch)."""
        layout = self.experts_per_block or tuple(ROUTES for _ in range(self.depth))
        feats, _ = self.forward_features(img=img)
        self.forward_features(txt=txt, txt_mask=txt_mask)
        if all("vl" in layout[i] for i in range(self.fusion_layer, self.depth)):
            feats, _ = self.forward_features(img=img, txt=txt, txt_mask=txt_mask)
        return self.pool(feats)

    def __call__(self, img=None, txt=None, txt_mask=None, deterministic=True):
        feats, _ = self.forward_features(
            img=img, txt=txt, txt_mask=txt_mask, deterministic=deterministic
        )
        return feats
