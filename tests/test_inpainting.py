"""Text-conditioned inpainting (finetune_inpainting): region mask
generator, the phase training end-to-end on synthetic data, and the
Predictor.inpaint() serving endpoint (predict codes → decode → paste)."""

import jax
import numpy as np
import pytest

from exploremultimodal_tpu.config import load_config

pytestmark = pytest.mark.quick


def test_region_mask_generator_one_rectangle():
    from exploremultimodal_tpu.data.masking import RegionMaskingGenerator

    gen = RegionMaskingGenerator(14, 75)
    rng = np.random.default_rng(0)
    for _ in range(20):
        m = gen(rng)
        assert m.shape == (14, 14)
        n = int(m.sum())
        assert 0 < n <= 75
        # exactly one contiguous rectangle: the bounding box is fully set
        rows = np.nonzero(m.any(axis=1))[0]
        cols = np.nonzero(m.any(axis=0))[0]
        assert m[rows[0]: rows[-1] + 1, cols[0]: cols[-1] + 1].all()


def test_synthetic_dataset_honors_region_mask_style():
    """data.mask_style=region must reach the synthetic dataset too (it
    builds its own generator unless the datamodule passes one through)."""
    from exploremultimodal_tpu.data.datamodule import MultiTaskData

    cfg = load_config([
        "model=vlmo_debug", "train=finetune_inpainting",
        "train.datasets=[synthetic]", "data.mask_style=region",
        "data.synthetic_size=4", "model.img_size=64",
        "data.num_mask_patches=6",
    ])
    data = MultiTaskData(cfg)
    m = data.datasets["train"][0]["image_bool_masked_pos"].reshape(4, 4)
    rows = np.nonzero(m.any(axis=1))[0]
    cols = np.nonzero(m.any(axis=0))[0]
    assert m[rows[0]: rows[-1] + 1, cols[0]: cols[-1] + 1].all()
    assert 0 < m.sum() <= 6


def test_finetune_inpainting_phase_trains(tmp_path):
    """dispatch('finetune_inpainting') on synthetic data: the mim objective
    runs over the fused stream (mum head) with masks + image4dalle emitted
    despite the finetune phase; loss finite and metrics reported."""
    from exploremultimodal_tpu.train.phases import dispatch
    from exploremultimodal_tpu.utils import create_logger

    cfg = load_config([
        "model=vlmo_debug", "train=finetune_inpainting",
        "train.datasets=[synthetic]", "data.mask_style=region",
        f"exp_dir={tmp_path}/run",
        "data.batch_size=4", "data.synthetic_size=8", "data.num_workers=0",
        "model.img_size=32", "model.max_text_len=8",
        "data.num_mask_patches=2", "data.min_mask_patches_per_block=1",
        "train.discrete_vae_type=random",
        "model.drop_rate=0.0", "model.attn_drop_rate=0.0",
        "model.drop_path_rate=0.0",
        "train.warmup_steps=1", "train.epochs=1", "compute_dtype=float32",
    ])
    logger = create_logger(str(tmp_path / "run"), 0)
    result = dispatch(cfg, logger)
    assert "history" in result and len(result["history"]) == 1
    stats = result["history"][0]
    assert np.isfinite(stats["mim_task_loss"])
    assert "mim_mean_acc" in stats


def test_predictor_inpaint_endpoint(tmp_path):
    """Predictor.inpaint: output pixels OUTSIDE the mask equal the resized
    original; masked cells come from the decoder; merged codes equal the
    encoder's codes off-mask."""
    from exploremultimodal_tpu.infer import Predictor
    from exploremultimodal_tpu.models import build_model
    from exploremultimodal_tpu.models.task import VlmoTask

    import jax.numpy as jnp

    cfg = load_config([
        "model=vlmo_debug", "train=finetune_inpainting",
        "train.discrete_vae_type=random",
        "model.img_size=32", "model.max_text_len=8",
        "model.drop_rate=0.0", "model.attn_drop_rate=0.0",
        "model.drop_path_rate=0.0", "compute_dtype=float32",
    ])
    task = build_model(cfg)
    dummy = {
        "image": jnp.zeros((1, 32, 32, 3), jnp.float32),
        "text_ids": jnp.zeros((1, 8), jnp.int32),
        "text_mask": jnp.ones((1, 8), jnp.int32),
    }
    variables = task.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        dummy, method=VlmoTask.init_inference,
    )
    pred = Predictor(cfg, variables["params"], max_batch=4)

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    grid = 2  # 32/16
    pm = np.zeros((2, grid, grid), np.int32)
    pm[:, 0, 0] = 1  # repaint the top-left patch

    out, merged = pred.inpaint(imgs, pm, texts=["a cat", "a dog"])
    S2, cell = 16, 8
    assert out.shape == (2, S2, S2, 3)
    assert merged.shape == (2, grid * grid)
    assert np.isfinite(out).all()
    assert (out >= 0).all() and (out <= 1).all()

    # off-mask pixels = the resized original (paste semantics)
    resized = np.asarray(
        jax.image.resize(jnp.asarray(imgs, jnp.float32) / 255.0,
                         (2, S2, S2, 3), "bilinear")
    )
    np.testing.assert_allclose(
        out[:, :, cell:], resized[:, :, cell:], atol=1e-6
    )
    np.testing.assert_allclose(out[:, cell:, :cell],
                               resized[:, cell:, :cell], atol=1e-6)
    # the repainted cell is the decoder's output, not the original
    assert np.abs(out[:, :cell, :cell] - resized[:, :cell, :cell]).max() > 1e-4

    # merged codes agree with the frozen encoder off-mask
    x4 = jax.image.resize(jnp.asarray(imgs, jnp.float32) / 255.0,
                          (2, S2, S2, 3), "bilinear")
    from exploremultimodal_tpu.models.dvae import map_pixels

    codes = np.asarray(pred.dvae.get_codebook_indices(map_pixels(x4)))
    np.testing.assert_array_equal(merged[:, 1:], codes[:, 1:])
