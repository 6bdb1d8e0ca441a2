"""VQA test-split submission JSON (reference vqa.py:440-477 capability)."""

import io
import json

import jax
import jax.numpy as jnp
import numpy as np
import pyarrow as pa
from PIL import Image

from exploremultimodal_tpu.config import load_config


def _jpeg(rng):
    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 256, (40, 40, 3), np.uint8)).save(
        buf, format="JPEG"
    )
    return buf.getvalue()


def test_write_vqa_submission(tmp_path):
    rng = np.random.default_rng(0)
    table = pa.table({
        "image": [_jpeg(rng) for _ in range(4)],
        "questions": [["what is it?"]] * 4,
        "question_id": [[100 + i] for i in range(4)],
    })
    root = tmp_path / "arrows"
    root.mkdir()
    with pa.OSFile(str(root / "vqav2_test.arrow"), "wb") as sink:
        with pa.ipc.new_file(sink, table.schema) as w:
            w.write_table(table)

    cfg = load_config([
        "model=vlmo_debug", "train=finetune_vqa",
        f"data.data_root={root}",
        "data.batch_size=2", "data.num_workers=1",
        "model.img_size=32", "model.embed_dim=32", "model.num_heads=2",
        "model.max_text_len=8", "data.vqav2_label_size=11",
        "model.drop_rate=0.0", "model.attn_drop_rate=0.0",
        "model.drop_path_rate=0.0", "compute_dtype=float32",
        f"exp_dir={tmp_path}/run",
    ])

    from exploremultimodal_tpu.models import build_model
    from exploremultimodal_tpu.models.task import VlmoTask
    from exploremultimodal_tpu.train.phases import write_vqa_submission
    from exploremultimodal_tpu.train.state import create_train_state
    from exploremultimodal_tpu.utils import create_logger
    import optax

    task = build_model(cfg)
    batch = {
        "image": jnp.zeros((2, 32, 32, 3)),
        "text_ids": jnp.zeros((2, 8), jnp.int32),
        "text_mask": jnp.ones((2, 8), jnp.int32),
        "vqa_targets": jnp.zeros((2, 11)),
    }
    variables = task.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        batch, method=VlmoTask.init_streams,
    )
    state = create_train_state(
        variables["params"], optax.sgd(0.0), jax.random.key(0)
    )
    from exploremultimodal_tpu.train.trainer import Trainer

    logger = create_logger(str(tmp_path / "run"), 0)
    trainer = Trainer(cfg, logger)
    out = write_vqa_submission(trainer, state)
    assert out is not None

    with open(out) as f:
        submission = json.load(f)
    assert len(submission) == 4
    qids = sorted(r["question_id"] for r in submission)
    assert qids == [100, 101, 102, 103]
    # answers map through the bundled 3129-answer vocabulary
    from exploremultimodal_tpu.data.vqa_vocab import load_or_build_vqa_vocab

    vocab = load_or_build_vqa_vocab()
    for r in submission:
        assert r["answer"] == vocab["id2answer"].get(
            int(list(vocab["id2answer"])[0]), r["answer"]
        ) or isinstance(r["answer"], str)
