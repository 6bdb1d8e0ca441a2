"""Multi-head attention compute paths.

Semantics match the reference attention exactly (models/vlmo/vlmo.py:68-98):
scores = q @ kᵀ · scale, additive −inf at masked KEY positions (key-padding
mask broadcast over heads and query positions), softmax, optional attention
dropout, weighted sum of v. Softmax runs in fp32 regardless of compute dtype.

Five implementations behind one signature (e2e numbers: BENCH.md — full
VLMo-Base pretrain step at batch 32):
  'auto'      — DEFAULT: picks by the measured A/Bs — 'pallas' while
                attention dropout is active (in-kernel mask regeneration
                keeps flash memory behavior: +13% e2e at attn_drop=0.1,
                BENCH.md round 3), 'recompute' otherwise (fastest at
                attn_drop=0: 207 ms vs 374 jax_flash / 272 pallas).
  'recompute' — the XLA einsum chain wrapped in jax.checkpoint, so the
                backward re-derives the (B, H, N, N) probabilities instead
                of storing them. 209 ms/step at attn_drop=0, trains batch
                64 on-chip; at attn_drop>0 it pays a materialized
                (B, H, N, N) mask pipeline in fwd AND recomputed bwd.
  'saveprobs' — 'recompute' with a save_only_these_names policy on the
                bf16 post-softmax probabilities: the backward reuses the
                stored probs (softmax bwd, dv, dscores all need exactly
                them) instead of re-deriving scores+softmax, while every
                other intermediate still rematerializes. Splits the
                memory/recompute trade between 'xla' (stores everything)
                and 'recompute' (stores nothing).
  'xla'       — plain chain (stores probs for backward; bf16-stored scores).
                205.4 ms at batch 32 (no bwd recompute) but OOMs at batch
                64: the stored ITM-stream probs are 129 MB/block.
  'jax_flash' — jax.experimental.pallas.ops.tpu.flash_attention — the
                upstream-tuned TPU flash kernel (fused fwd + true flash
                bwd). Sequences pad to 128 lanes; key-padding masks become
                SegmentIds so no (B, H, N, N) tensor ever reaches HBM. No
                in-kernel dropout, so attn_drop>0 falls through; N<128
                streams (text-only, 40 tokens) use the stored-probs chain
                instead of paying 3.2× pad FLOPs on tiny matmuls. LOSES
                every A/B on this chip (373.6 ms e2e vs recompute's 207.3
                at VLMo pretrain; 106.6 vs 55.8 ms fwd+bwd at N=4096) —
                carried as an upstream-maintained alternative only.
  'pallas'    — hand-written TPU kernels (ops/flash_attention.py): full-row
                fused forward + true flash BACKWARD (dq/dk/dv from five MXU
                matmuls per head, probabilities reconstituted from the saved
                logsumexp) ≤512 tokens, with OPTIONAL in-kernel attention
                dropout (counter-hash keep-mask regenerated in the backward
                — no mask ever reaches HBM); full-row forward with recompute
                backward to 4096; k-blocked online-softmax beyond. At
                attn_drop=0 the per-program overhead of many small-grid
                kernels loses to XLA's batched fusions (272 vs 209 ms); at
                attn_drop=0.1 it WINS (272 vs 309 ms) — hence 'auto'.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def key_padding_bias(mask: jax.Array | None, dtype=jnp.float32) -> jax.Array | None:
    """(B, N) {0,1} key mask → (B, 1, 1, N) additive bias (0 keep / −inf drop)."""
    if mask is None:
        return None
    return ((1.0 - mask.astype(dtype)) * NEG_INF)[:, None, None, :]


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    bias: jax.Array | None = None,
    scale: float | None = None,
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
    deterministic: bool = True,
    impl: str = "recompute",
) -> jax.Array:
    """q, k, v: (B, H, N, D_head) → (B, H, N, D_head).

    (A (B, N, H, D) layout variant — head transpose folded into the
    dot_generals instead of materialized copies — was A/B'd in round 3 and
    REGRESSED the headline step 207→220 ms: XLA's chosen dot layouts got
    worse than the explicit transposes it replaced. See BENCH.md round 3.)"""
    if scale is None:
        scale = q.shape[-1] ** -0.5

    use_dropout = dropout_rate > 0.0 and not deterministic
    if impl == "auto":
        # measured policy (BENCH.md round 3): the flash kernels' in-kernel
        # dropout beats XLA's materialized mask pipeline whenever attention
        # dropout is live; with dropout off, XLA recompute is fastest
        # (jax_flash A/B'd at 373.6 ms vs 207.3 — see BENCH.md)
        impl = "pallas" if use_dropout else "recompute"
    if (
        impl == "jax_flash"
        and not use_dropout
        and q.shape[-2] == k.shape[-2]
        and q.shape[-2] >= 128
        and jax.default_backend() == "tpu"
    ):
        return _jax_flash(q, k, v, bias=bias, scale=scale)
    if impl == "jax_flash":
        # short rows (text-only stream, 40 tokens) pay ~3.2× pad FLOPs in
        # the 128-lane kernel; dropout has no in-kernel path upstream —
        # both fall through to the stored-probs chain (cheap at N=40)
        impl = "xla"
    if impl == "pallas" and q.shape[-2] == k.shape[-2]:
        from exploremultimodal_tpu.ops import flash_attention as fa

        n_pad = fa._round_up(q.shape[-2], fa.BLOCK_Q)
        # dropout runs IN-KERNEL (mask regenerated in the flash backward)
        # while the fused backward applies; longer sequences fall through
        # to the recompute path below
        if not use_dropout or n_pad <= fa.LONG_SEQ_THRESHOLD:
            drop_kw = {}
            if use_dropout:
                drop_kw = dict(
                    dropout_rate=dropout_rate,
                    dropout_seed=jax.random.bits(
                        dropout_rng, (), jnp.uint32
                    ).astype(jnp.int32),
                )
            return fa.flash_attention(q, k, v, bias=bias, scale=scale, **drop_kw)

    def core(q, k, v, bias, rng):
        # EMM_ATTN_BF16_SCORES=1 (r4 A/B): emit the score dot in the input
        # dtype instead of forcing an f32 dot output — probes whether the
        # f32-out batched matmul is what holds the bhqd,bhkd->bhqk dots at
        # ~19 TFLOP/s in the bert_mlm profile (BENCH.md r4)
        pet = (
            None
            if os.environ.get("EMM_ATTN_BF16_SCORES", "") == "1"
            else jnp.float32
        )
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=pet
        ) * scale
        if bias is not None:
            scores = scores + bias.astype(scores.dtype)
        # Store the (B, H, N, N) score tensor in the COMPUTE dtype: the fp32
        # → bf16 cast fuses into the matmul epilogue and the fp32 upcast
        # fuses into the softmax reductions, so all fp32 math stays inside
        # fusions and only bf16 ever reaches HBM — attention here is
        # bandwidth-bound on score traffic (BENCH.md round-2 profile), and
        # this halves it. In fp32 compute (parity tests) it is a no-op.
        # Matches the reference under AMP: fp16-stored scores, fp32-internal
        # softmax (torch autocast softmax rule).
        scores = scores.astype(v.dtype)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        if use_dropout:
            keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, probs.shape)
            probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
        probs = probs.astype(v.dtype)
        if impl == "saveprobs":
            from jax.ad_checkpoint import checkpoint_name

            probs = checkpoint_name(probs, "attn_probs")
        return jnp.einsum("bhqk,bhkd->bhqd", probs, v)

    if impl == "saveprobs":
        core = jax.checkpoint(
            core,
            policy=jax.checkpoint_policies.save_only_these_names("attn_probs"),
        )
    elif impl != "xla":  # 'recompute' (default) + pallas' dropout fallback
        core = jax.checkpoint(core)
    return core(q, k, v, bias, dropout_rng)


def _jax_flash(q, k, v, *, bias, scale):
    """Upstream-tuned TPU flash attention (fused fwd + true flash bwd).

    Pads the sequence to the kernel's 128-lane granule and converts the
    key-padding bias back into SegmentIds: every query carries segment 1,
    keys carry their {0,1} keep-mask — segment mismatch masks exactly the
    padded keys, so no (B, H, N, N) tensor ever reaches HBM in either pass.
    Padded query rows attend real keys like the reference's padded rows do
    (key-padding semantics only) and are sliced off before return.
    """
    from jax.experimental.pallas.ops.tpu import flash_attention as upstream

    b, h, n, _ = q.shape
    n_pad = -(-n // 128) * 128
    if bias is not None:
        kv_seg = (bias[:, 0, 0, :] > NEG_INF * 0.5).astype(jnp.int32)
    else:
        kv_seg = jnp.ones((b, n), jnp.int32)
    pad = n_pad - n
    if pad:
        q, k, v = (jnp.pad(t, ((0, 0), (0, 0), (0, pad), (0, 0))) for t in (q, k, v))
        kv_seg = jnp.pad(kv_seg, ((0, 0), (0, pad)))
    seg = upstream.SegmentIds(q=jnp.ones((b, n_pad), jnp.int32), kv=kv_seg)
    out = upstream.flash_attention(q, k, v, segment_ids=seg, sm_scale=scale)
    return out[:, :, :n, :] if pad else out
