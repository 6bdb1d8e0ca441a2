"""On-device fused image preprocessing.

TPU-native replacement of the reference's host-side torchvision normalize +
logit-Laplace map (datamodule_base.py:186-191) and the CUDA-stream H2D
staging loader (data/utils/bg_dataloader.py): uint8 crops cross host→device
(4× less PCIe/ICI traffic than fp32), and the scale/normalize/map_pixels math
fuses into the train step's XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from exploremultimodal_tpu.data.transforms import CLIP_MEAN, CLIP_STD
from exploremultimodal_tpu.models.dvae import map_pixels


def normalize_image(img_u8: jax.Array, dtype=jnp.float32) -> jax.Array:
    """uint8 NHWC → CLIP-normalized float (backbone stream)."""
    x = img_u8.astype(jnp.float32) / 255.0
    mean = jnp.asarray(CLIP_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_STD, jnp.float32)
    return ((x - mean) / std).astype(dtype)


def dalle_image(img_u8: jax.Array) -> jax.Array:
    """uint8 NHWC → logit-Laplace-mapped float (dVAE tokenizer stream)."""
    return map_pixels(img_u8.astype(jnp.float32) / 255.0)


def preprocess_batch(batch: dict, dtype=jnp.float32) -> dict:
    """Expand uint8 `*_u8` fields into the model-ready float fields."""
    out = dict(batch)
    for key in ("image", "image_0", "image_1", "image_aug"):
        u8 = out.pop(f"{key}_u8", None)
        if u8 is not None:
            out[key] = normalize_image(u8, dtype)
    u8 = out.pop("image4dalle_u8", None)
    if u8 is not None:
        out["image4dalle"] = dalle_image(u8)
    return out
