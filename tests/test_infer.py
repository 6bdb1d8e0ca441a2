"""Serving API (exploremultimodal_tpu/infer.py): jitted fixed-bucket
endpoints over trained weights — ITC embeddings, ITM rerank, VQA answers —
matching the training-time eval compute paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exploremultimodal_tpu.config import load_config
from exploremultimodal_tpu.infer import Predictor, _next_bucket

TINY = [
    "model=vlmo_debug",
    "model.img_size=32",
    "model.embed_dim=32",
    "model.num_heads=2",
    "model.max_text_len=12",
    "model.drop_rate=0.0",
    "model.attn_drop_rate=0.0",
    "model.drop_path_rate=0.0",
    "compute_dtype=float32",
    "attn_impl=xla",
]


def _predictor(extra=()):
    from exploremultimodal_tpu.models.task import VlmoTask, build_model

    cfg = load_config(TINY + list(extra))
    task = build_model(cfg)
    dummy = {
        "image": jnp.zeros((1, 32, 32, 3), jnp.float32),
        "text_ids": jnp.zeros((1, 12), jnp.int32),
        "text_mask": jnp.ones((1, 12), jnp.int32),
    }
    variables = task.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        dummy, method=VlmoTask.init_inference,
    )
    return Predictor(cfg, variables["params"], max_batch=8)


def test_bucket_helper():
    assert [_next_bucket(n, 8) for n in (1, 2, 3, 5, 8)] == [1, 2, 4, 8, 8]
    assert _next_bucket(11, 8) == 11  # never truncates past max_batch


def test_encode_unit_norm_and_padding_invariance():
    pred = _predictor(["train=pretrain_mum"])
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (3, 32, 32, 3), dtype=np.uint8)

    emb3 = pred.encode_image(imgs)          # bucket 4 (padded)
    assert emb3.shape[0] == 3
    np.testing.assert_allclose(np.linalg.norm(emb3, axis=-1), 1.0, rtol=1e-5)

    emb1 = pred.encode_image(imgs[:1])      # bucket 1 — different padding
    np.testing.assert_allclose(emb3[0], emb1[0], rtol=1e-5, atol=1e-6)

    texts = ["a dog on a beach", "two cats", "a red bus"]
    temb = pred.encode_text(texts)
    assert temb.shape[0] == 3
    np.testing.assert_allclose(np.linalg.norm(temb, axis=-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(
        pred.encode_text(texts[:1])[0], temb[0], rtol=1e-5, atol=1e-6
    )

    sims = pred.similarity(emb3, temb)
    assert sims.shape == (3, 3) and np.all(np.isfinite(sims))


def test_itm_scores_paired():
    pred = _predictor(["train=pretrain_mum"])
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 255, (3, 32, 32, 3), dtype=np.uint8)
    scores = pred.itm_score(imgs, ["a", "b", "c"])
    assert scores.shape == (3,)
    assert np.all((scores >= 0) & (scores <= 1))
    with pytest.raises(ValueError):
        pred.itm_score(imgs, ["a", "b"])


def test_nlvr2_pair_probabilities():
    pred = _predictor(["train=finetune_nlvr2"])
    rng = np.random.default_rng(3)
    left = rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8)
    right = rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8)
    probs = pred.nlvr2(left, right, ["the left image has a dog"] * 2)
    assert probs.shape == (2,)
    assert np.all((probs >= 0) & (probs <= 1))
    # order of the pair matters (token types 1/2 are distinct)
    swapped = pred.nlvr2(right, left, ["the left image has a dog"] * 2)
    assert not np.allclose(probs, swapped)


def test_vqa_answers_are_vocab_strings():
    pred = _predictor(["train=finetune_vqa"])
    rng = np.random.default_rng(2)
    imgs = rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8)
    answers = pred.vqa(imgs, ["what color is it?", "how many dogs?"])
    assert len(answers) == 2 and all(isinstance(a, str) and a for a in answers)


def test_mesh_data_parallel_serving(eight_devices):
    """Multi-chip serving: params replicated, endpoint batches sharded over
    the 'data' axis; results identical to single-device serving."""
    from jax.sharding import Mesh

    from exploremultimodal_tpu.models.task import VlmoTask, build_model

    cfg = load_config(TINY + ["train=pretrain_mum"])
    task = build_model(cfg)
    dummy = {
        "image": jnp.zeros((1, 32, 32, 3), jnp.float32),
        "text_ids": jnp.zeros((1, 12), jnp.int32),
        "text_mask": jnp.ones((1, 12), jnp.int32),
    }
    params = task.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        dummy, method=VlmoTask.init_inference,
    )["params"]

    mesh = Mesh(np.asarray(eight_devices), ("data",))
    sharded = Predictor(cfg, params, max_batch=16, mesh=mesh)
    single = Predictor(cfg, params, max_batch=16)

    rng = np.random.default_rng(7)
    imgs = rng.integers(0, 255, (5, 32, 32, 3), dtype=np.uint8)  # pads to 8
    a = sharded.encode_image(imgs)
    b = single.encode_image(imgs)
    assert a.shape == (5, np.asarray(b).shape[1])
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6)


def test_from_checkpoint_orbax_roundtrip(tmp_path):
    """Weights trained+saved by the trainer load into a Predictor with
    identical endpoint outputs."""
    from exploremultimodal_tpu.train import checkpoints as ckpt_lib
    from exploremultimodal_tpu.train.trainer import Trainer

    cfg = load_config(TINY + [
        "train=pretrain_mum", "train.datasets=[synthetic]",
        "train.discrete_vae_type=random",
        "data.batch_size=4", "data.synthetic_size=8", "data.num_workers=1",
        "data.num_mask_patches=2", "data.min_mask_patches_per_block=1",
        "train.warmup_steps=1", "train.epochs=1",
        f"exp_dir={tmp_path}",
    ])
    trainer = Trainer(cfg)
    loader = trainer.data.train_loader()
    state = trainer.init_state(next(iter(loader)))
    batch = next(iter(trainer.feeder(iter(loader))))
    step = trainer.make_train_step()
    state, _ = step(state, batch, jnp.asarray(0.0))
    ckpt_lib.save(str(tmp_path), state, cfg, epoch=0)

    pred = Predictor.from_checkpoint(
        str(tmp_path / "checkpoint-0"),
        overrides=TINY + ["train=pretrain_mum"],
        max_batch=8,
    )
    for a, b in zip(jax.tree.leaves(pred.variables["params"]),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    imgs = np.zeros((2, 32, 32, 3), np.uint8)
    emb = pred.encode_image(imgs)
    assert emb.shape[0] == 2 and np.all(np.isfinite(emb))


def test_serving_with_w8a8_pallas_mlp_quantization():
    """The serving API accepts model.quantize=w8a8_pallas_mlp (the measured
    int8 serving configuration, BENCH.md "Pallas fused W8A8"): same param
    tree as bf16, embeddings stay unit-norm and close to the unquantized
    endpoint's output."""
    p_ref = _predictor()
    p_q = _predictor(["model.quantize=w8a8_pallas_mlp"])
    # identical tree -> the bf16 predictor's params serve the quantized one
    assert jax.tree.structure(p_ref.variables) == jax.tree.structure(
        p_q.variables
    )
    p_q.variables = p_ref.variables

    img = np.random.default_rng(0).integers(
        0, 255, (3, 32, 32, 3), np.uint8
    )
    e_ref = p_ref.encode_image(img)
    e_q = p_q.encode_image(img)
    np.testing.assert_allclose(
        np.linalg.norm(e_q, axis=-1), 1.0, rtol=1e-3
    )
    # quantization noise envelope: cosine similarity stays high
    cos = (e_ref * e_q).sum(-1)
    assert (cos > 0.98).all(), cos


def test_caption_mask_predict_decoding():
    """Predictor.caption: the in-graph mask-predict loop fills every [MASK]
    (no mask tokens survive), respects max_tokens, is deterministic, and
    returns decodable strings (random weights → gibberish text, but the
    contract — shapes, schedule, special-token handling — is exact)."""
    pred = _predictor(["train=finetune_caption"])
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (3, 32, 32, 3), dtype=np.uint8)

    caps = pred.caption(imgs, max_tokens=6, n_iter=3)
    assert len(caps) == 3
    assert all(isinstance(c, str) for c in caps)

    # deterministic: same inputs, same captions
    caps2 = pred.caption(imgs, max_tokens=6, n_iter=3)
    assert caps == caps2

    # the raw decode must leave zero [MASK] ids in the generated span
    from exploremultimodal_tpu.infer import _caption_fn, _pad_to
    import functools

    tok = pred.tokenizer
    L = pred.task.config.max_text_len
    T = 6
    row = ([tok.cls_token_id] + [tok.mask_token_id] * T
           + [tok.sep_token_id] + [tok.pad_token_id] * (L - 2 - T))
    ids = np.tile(np.asarray(row, np.int32), (3, 1))
    mask = np.zeros((3, L), np.int32)
    mask[:, : T + 2] = 1
    fn = functools.partial(_caption_fn, n_iter=3,
                           mask_id=int(tok.mask_token_id))
    out = np.asarray(pred.task.apply(
        pred.variables, _pad_to(imgs, 4), _pad_to(ids, 4), _pad_to(mask, 4),
        method=fn,
    ))
    assert (out[:, 1:T + 1] != tok.mask_token_id).all()
    # non-generatable positions untouched
    assert (out[:, 0] == tok.cls_token_id).all()
    assert (out[:, T + 1] == tok.sep_token_id).all()
    assert (out[:, T + 2:] == tok.pad_token_id).all()


def test_finetune_caption_phase_runs(tmp_path):
    """finetune_caption is a RUNNABLE phase (reference driver is log-only):
    two steps of multimodal MLM over synthetic image-caption pairs, finite
    loss."""
    from exploremultimodal_tpu.train.trainer import Trainer

    cfg = load_config(TINY + [
        "train=finetune_caption",
        "train.datasets=[synthetic]",
        "data.batch_size=4",
        "data.synthetic_size=8",
        "data.num_workers=0",
        "data.num_mask_patches=2",
        "data.min_mask_patches_per_block=1",
        "train.warmup_steps=2",
        f"exp_dir={tmp_path}",
    ])
    trainer = Trainer(cfg)
    loader = trainer.data.train_loader()
    batch = next(iter(trainer.feeder(iter(loader))))
    state = trainer.init_state(batch)
    step = trainer.make_train_step()
    for _ in range(2):
        state, metrics = step(state, batch, jnp.asarray(0.0))
    assert np.isfinite(float(metrics["total_loss"]))
    assert "mlm_task_loss" in metrics
