"""Task heads (reference parity: models/vlmo/heads.py).

MLMHead ties its decoder to the backbone word-embedding table
(heads.py:86-101); in the functional setting the table is passed in at call
time rather than aliased, so the gradient flows to the single shared param.
ISDA (implicit semantic data augmentation, heads.py:6-83) keeps running
per-class feature mean/variance — represented here as an explicit state
pytree updated functionally.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class MLMTransform(nn.Module):
    """BertPredictionHeadTransform (dense→gelu→LN) + output bias; the tied
    decoder matmul itself lives on the backbone (VLMO.attend_vocab)."""

    dim: int
    vocab_size: int
    norm_eps: float = 1e-12
    dtype: Dtype = jnp.float32

    def setup(self) -> None:
        self.transform_dense = nn.Dense(self.dim, dtype=self.dtype)
        self.transform_ln = nn.LayerNorm(epsilon=self.norm_eps, dtype=jnp.float32)
        self.out_bias = self.param(
            "bias", nn.initializers.zeros, (self.vocab_size,)
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        x = self.transform_dense(x)
        x = nn.gelu(x, approximate=False)
        return self.transform_ln(x).astype(self.dtype)

    def bias(self) -> jax.Array:
        return self.out_bias


class MIMHead(nn.Module):
    """Linear hs → img_vocab_size (8192 dVAE codes)."""

    vocab_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Dense(self.vocab_size, dtype=self.dtype, name="fc")(x)


class ITCHead(nn.Module):
    """Per-route ('v'/'l') projection to the contrastive space + L2 norm."""

    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, route: str) -> jax.Array:
        assert route in ("v", "l")
        x = nn.Dense(self.out_dim, dtype=self.dtype, name=f"dense_{route}")(x)
        norm = jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)
        return (x / jnp.maximum(norm, 1e-12).astype(x.dtype)).astype(x.dtype)


class ITMHead(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Dense(2, dtype=self.dtype, name="fc")(x)


class MPPHead(nn.Module):
    """Transform + 256·3-way masked-patch-prediction decoder (heads.py:141-151)."""

    dim: int
    norm_eps: float = 1e-12
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.dim, dtype=self.dtype, name="transform_dense")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.LayerNorm(
            epsilon=self.norm_eps, dtype=jnp.float32, name="transform_ln"
        )(x).astype(self.dtype)
        return nn.Dense(256 * 3, dtype=self.dtype, name="decoder")(x)


class VQAClassifier(nn.Module):
    """hs → 2hs → LN → gelu → num_classes (vlmo_module.py:89-94)."""

    dim: int
    num_classes: int
    norm_eps: float = 1e-12
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, return_hidden: bool = False):
        h = nn.Dense(2 * self.dim, dtype=self.dtype, name="fc1")(x)
        h = nn.LayerNorm(epsilon=self.norm_eps, dtype=jnp.float32, name="ln")(h)
        h = nn.gelu(h.astype(self.dtype), approximate=False)
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="fc2")(h)
        if return_hidden:
            return logits, h
        return logits


class NLVR2Classifier(nn.Module):
    """2hs → 2hs → LN → gelu → 2 (vlmo_module.py:104-109)."""

    dim: int
    norm_eps: float = 1e-12
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Dense(2 * self.dim, dtype=self.dtype, name="fc1")(x)
        h = nn.LayerNorm(epsilon=self.norm_eps, dtype=jnp.float32, name="ln")(h)
        h = nn.gelu(h.astype(self.dtype), approximate=False)
        return nn.Dense(2, dtype=self.dtype, name="fc2")(h)


class MAEHead(nn.Module):
    """Masked-autoencoder pixel decoder: hs → patch_size²·3 (the runnable
    version of the reference's intended pretrain_vis objective,
    train/pretrain/visual.py:199-232)."""

    patch_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Dense(
            self.patch_size * self.patch_size * 3, dtype=self.dtype, name="fc"
        )(x)


class ImgClsHead(nn.Module):
    """Image-classification head over pooled features (finetune_vis surface;
    reference compute_imgcls, objectives.py:862-882)."""

    num_classes: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)


class RankHead(nn.Module):
    """IRTR rank output hs → 1 (vlmo_module.py:113-115)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Dense(1, dtype=self.dtype, name="fc")(x)


class RefHead(nn.Module):
    """Referring-expression grounding head: pooled fused feats → normalized
    (cx, cy, w, h) box via sigmoid (MDETR-style single-box regression). The
    reference reserves this head slot but leaves it a literal `...` stub
    (vlmo_module.py:117-118); runnable here for the finetune_ref phase.
    Structure mirrors VQAClassifier (hs → 2hs → LN → gelu → 4)."""

    dim: int
    norm_eps: float = 1e-12
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Dense(2 * self.dim, dtype=self.dtype, name="fc1")(x)
        h = nn.LayerNorm(epsilon=self.norm_eps, dtype=jnp.float32, name="ln")(h)
        h = nn.gelu(h.astype(self.dtype), approximate=False)
        box = nn.Dense(4, dtype=self.dtype, name="fc2")(h)
        return jax.nn.sigmoid(box.astype(jnp.float32))


# --------------------------------------------------------------------- ISDA


class ISDAState(NamedTuple):
    """Running per-class feature statistics (EstimatorCV, heads.py:6-51)."""

    count: jax.Array  # (C,)
    mean: jax.Array  # (C, A)
    cov: jax.Array  # (C, A) diagonal variances

    @classmethod
    def create(cls, num_classes: int, feature_dim: int) -> "ISDAState":
        return cls(
            count=jnp.zeros((num_classes,), jnp.float32),
            mean=jnp.zeros((num_classes, feature_dim), jnp.float32),
            cov=jnp.zeros((num_classes, feature_dim), jnp.float32),
        )


def isda_update(state: ISDAState, features: jax.Array, onehot: jax.Array) -> ISDAState:
    """Welford-style merge of the batch's per-class mean/var into the running
    estimate (EstimatorCV.forward, heads.py:15-51). `onehot` is (N, C) with
    soft VQA targets binarized upstream."""
    features = jax.lax.stop_gradient(features.astype(jnp.float32))
    onehot = onehot.astype(jnp.float32)

    amount = onehot.sum(0)  # (C,)
    amount_safe = jnp.maximum(amount, 1.0)
    sums = onehot.T @ features  # (C, A)
    ave = sums / amount_safe[:, None]
    sq_dev = onehot.T @ (features**2) - 2 * ave * sums + (ave**2) * amount[:, None]
    var = sq_dev / amount_safe[:, None]

    weight = amount / jnp.maximum(amount + state.count, 1.0)  # (C,)
    weight = jnp.nan_to_num(weight)[:, None]

    new_cov = (
        state.cov * (1 - weight)
        + var * weight
        + weight * (1 - weight) * (state.mean - ave) ** 2
    )
    new_mean = state.mean * (1 - weight) + ave * weight
    return ISDAState(count=state.count + amount, mean=new_mean, cov=new_cov)


def isda_logits(
    logits: jax.Array,
    features: jax.Array,
    fc_weight: jax.Array,  # (A, C): last-layer kernel
    labels: jax.Array,  # (N,) argmax class ids
    cov: jax.Array,  # (C, A)
    ratio: float | jax.Array,
) -> jax.Array:
    """ISDA logit augmentation (ISDAHead.isda_aug, heads.py:61-74):
    y_c += ratio/2 · Σ_a (w_c − w_y)² σ²_{y,a}."""
    w = fc_weight.T.astype(jnp.float32)  # (C, A)
    w_y = w[labels]  # (N, A)
    cov_y = cov[labels]  # (N, A)
    sigma2 = ((w[None, :, :] - w_y[:, None, :]) ** 2 * cov_y[:, None, :]).sum(-1)
    return logits + 0.5 * ratio * sigma2.astype(logits.dtype)
