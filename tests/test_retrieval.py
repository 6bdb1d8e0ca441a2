"""Retrieval: IRTR ranking loss e2e, recall@K math, rank-head warm start."""

import jax
import jax.numpy as jnp
import numpy as np

from exploremultimodal_tpu.config import load_config
from exploremultimodal_tpu.models.task import adjust_downstream_params
from exploremultimodal_tpu.train.retrieval import recall_at_k

TINY = [
    "model=vlmo_debug",
    "train=finetune_retrieval",
    "train.datasets=[synthetic]",
    "data.batch_size=4",
    "data.synthetic_size=8",
    "data.num_workers=1",
    "model.img_size=32",
    "model.embed_dim=32",
    "model.num_heads=2",
    "model.max_text_len=8",
    "model.itc_dim=16",
    "model.drop_rate=0.0",
    "model.attn_drop_rate=0.0",
    "model.drop_path_rate=0.0",
    "data.num_mask_patches=2",
    "data.min_mask_patches_per_block=1",
    "train.warmup_steps=1",
    "compute_dtype=float32",
]


def test_recall_at_k_math():
    # identity features: perfect retrieval
    feats = np.eye(6, 4, dtype=np.float32)
    feats /= np.maximum(np.linalg.norm(feats, axis=1, keepdims=True), 1e-9)
    out = recall_at_k(feats, feats, ks=(1, 5))
    # rows 4,5 are zero vectors (rank ambiguity) — restrict to informative rows
    informative = recall_at_k(feats[:4], feats[:4], ks=(1,))
    assert informative["i2t_recall@1"] == 1.0
    assert informative["t2i_recall@1"] == 1.0

    # shifted pairing: recall@1 = 0 but recall@2 = 1
    img = np.eye(4, 4, dtype=np.float32)
    txt = np.roll(img, 1, axis=0) + 0.9 * img
    out = recall_at_k(img, txt, ks=(1, 2))
    assert out["i2t_recall@2"] >= out["i2t_recall@1"]


def test_irtr_train_step_and_false_texts(tmp_path):
    from exploremultimodal_tpu.train.trainer import Trainer

    cfg = load_config(TINY + [f"exp_dir={tmp_path}"])
    trainer = Trainer(cfg)
    loader = trainer.data.train_loader()
    batch_host = next(iter(loader))
    assert batch_host["false_text_ids"].shape == (4, 3, 8)

    state = trainer.init_state(batch_host)
    train_step = trainer.make_train_step()
    batch = next(iter(trainer.feeder(iter(loader))))
    state, metrics = train_step(state, batch, jnp.asarray(0.0))
    assert np.isfinite(float(metrics["irtr_task_loss"]))
    assert np.isfinite(float(metrics["itc_task_loss"]))


def test_rank_head_warm_start_from_itm():
    params = {
        "itm_head": {"fc": {"kernel": jnp.asarray(np.arange(8, dtype=np.float32).reshape(4, 2)),
                            "bias": jnp.asarray([0.5, -0.5])}},
        "rank_output": {"fc": {"kernel": jnp.zeros((4, 1)), "bias": jnp.zeros((1,))}},
    }
    out = adjust_downstream_params(params, ("irtr",))
    np.testing.assert_allclose(
        np.asarray(out["rank_output"]["fc"]["kernel"])[:, 0],
        np.asarray(params["itm_head"]["fc"]["kernel"])[:, 1],
    )
    np.testing.assert_allclose(np.asarray(out["rank_output"]["fc"]["bias"]), [-0.5])
    # no-op without both heads
    out2 = adjust_downstream_params({"rank_output": {}}, ("irtr",))
    assert out2 == {"rank_output": {}}


def test_retrieval_recall_end_to_end(tmp_path):
    from exploremultimodal_tpu.train.retrieval import evaluate_retrieval
    from exploremultimodal_tpu.train.trainer import Trainer

    cfg = load_config(TINY + [f"exp_dir={tmp_path}"])
    trainer = Trainer(cfg)
    loader = trainer.data.train_loader()
    state = trainer.init_state(next(iter(loader)))
    recalls = evaluate_retrieval(trainer, state, trainer.data.train_loader())
    for k in ("i2t_recall@1", "t2i_recall@5", "recall_mean"):
        assert 0.0 <= recalls[k] <= 1.0
