"""pyarrow-backed dataset tests against synthetic .arrow files (the
reference's on-disk format: one RecordBatch file per table,
base_dataset.py:44-56)."""

import io
import os

import numpy as np
import pyarrow as pa
import pytest
from PIL import Image

from exploremultimodal_tpu.data import (
    ImageTextArrowDataset,
    Nlvr2ArrowDataset,
    VqaArrowDataset,
    get_tokenizer,
)
from exploremultimodal_tpu.data.transforms import EvalTransform


def _jpeg_bytes(rng, w=48, h=40):
    arr = rng.integers(0, 256, (h, w, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG")
    return buf.getvalue()


def _write_arrow(path, table):
    with pa.OSFile(str(path), "wb") as sink:
        with pa.ipc.new_file(sink, table.schema) as writer:
            writer.write_table(table)


@pytest.fixture(scope="module")
def arrow_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("arrows")
    rng = np.random.default_rng(0)

    # caption table: 3 images × variable captions
    captions = [["a cat", "feline resting"], ["a dog"], ["red car", "fast car", "vehicle"]]
    table = pa.table({
        "image": [_jpeg_bytes(rng) for _ in range(3)],
        "caption": captions,
    })
    _write_arrow(root / "tiny_captions.arrow", table)

    # vqa table
    vqa = pa.table({
        "image": [_jpeg_bytes(rng) for _ in range(2)],
        "questions": [["what color?"], ["how many dogs?", "is it day?"]],
        "answer_labels": [[[3, 7]], [[1], [0, 2]]],
        "answer_scores": [[[1.0, 0.3]], [[0.9], [0.6, 1.0]]],
        "question_id": [[11], [22, 33]],
    })
    _write_arrow(root / "tiny_vqa.arrow", vqa)

    # nlvr2 table
    nlvr = pa.table({
        "image_0": [_jpeg_bytes(rng) for _ in range(2)],
        "image_1": [_jpeg_bytes(rng) for _ in range(2)],
        "questions": [["left is bigger"], ["both are red"]],
        "answers": [[True], [False]],
        "table_name": ["nlvr2_dev", "nlvr2_test1"],
    })
    _write_arrow(root / "tiny_nlvr2.arrow", nlvr)
    return root


def test_caption_dataset_flattening(arrow_root):
    tok = get_tokenizer()
    ds = ImageTextArrowDataset(
        str(arrow_root), ["tiny_captions"],
        transform=EvalTransform(32, 16),
        tokenizer=tok, max_text_len=12,
    )
    assert len(ds) == 6  # 2 + 1 + 3 caption pairs
    s = ds[1]
    assert s["image_u8"].shape == (32, 32, 3)
    assert s["image4dalle_u8"].shape == (16, 16, 3)
    assert ds.get_raw_text(1) == "feline resting"
    assert ds.get_raw_text(3) == "red car"
    decoded = tok.decode([t for t in s["text_ids"] if t not in (0,)],
                         skip_special_tokens=True)
    assert decoded == "feline resting"


def test_caption_dataset_resamples_corrupt_rows(arrow_root, tmp_path):
    rng = np.random.default_rng(1)
    table = pa.table({
        "image": [b"not a jpeg", _jpeg_bytes(rng)],
        "caption": [["broken"], ["fine"]],
    })
    _write_arrow(tmp_path / "corrupt.arrow", table)
    ds = ImageTextArrowDataset(
        str(tmp_path), ["corrupt"], transform=EvalTransform(16),
        tokenizer=get_tokenizer(), max_text_len=8,
    )
    s = ds[0]  # corrupt row → silently resampled to the good one
    assert s["image_u8"].shape == (16, 16, 3)


def test_vqa_dataset_targets(arrow_root):
    ds = VqaArrowDataset(
        str(arrow_root), ["tiny_vqa"], transform=EvalTransform(16),
        tokenizer=get_tokenizer(), max_text_len=8, label_size=10,
    )
    assert len(ds) == 3
    s0 = ds[0]
    np.testing.assert_allclose(s0["vqa_targets"][[3, 7]], [1.0, 0.3])
    assert s0["vqa_targets"].sum() == pytest.approx(1.3)
    assert int(s0["qid"]) == 11
    s2 = ds[2]
    np.testing.assert_allclose(s2["vqa_targets"][[0, 2]], [0.6, 1.0])
    assert int(s2["qid"]) == 33


def test_nlvr2_dataset_pairs(arrow_root):
    ds = Nlvr2ArrowDataset(
        str(arrow_root), ["tiny_nlvr2"], transform=EvalTransform(16),
        tokenizer=get_tokenizer(), max_text_len=8,
    )
    assert len(ds) == 2
    s = ds[0]
    assert s["image_0_u8"].shape == (16, 16, 3)
    assert s["image_1_u8"].shape == (16, 16, 3)
    assert int(s["answers"]) == 1
    assert s["table_name"] == "nlvr2_dev"
    assert int(ds[1]["answers"]) == 0


def test_multitask_data_synthetic_end_to_end():
    from exploremultimodal_tpu.config import load_config
    from exploremultimodal_tpu.data import MultiTaskData

    cfg = load_config([
        "model=vlmo_debug", "train=pretrain_mum",
        "train.datasets=[synthetic]", "data.batch_size=4",
        "data.synthetic_size=16", "data.num_workers=2",
    ])
    data = MultiTaskData(cfg)
    loader = data.train_loader()
    assert len(loader) == 4
    batch = next(iter(loader))
    assert batch["image_u8"].shape == (4, 224, 224, 3)
    assert batch["image4dalle_u8"].shape == (4, 112, 112, 3)
    assert batch["text_ids_mlm"].shape == (4, 40)
    assert batch["image_bool_masked_pos"].shape == (4, 196)
    assert batch["image_bool_masked_pos"].sum(-1).min() >= 75


def test_gcc_style_31_shard_concat(tmp_path):
    """The gcc×31 shard path (datamodule.py ARROW_TABLES['gcc']): one
    ImageTextArrowDataset over 31 shard tables must concatenate row spaces in
    shard order with caption flattening intact across shard boundaries."""
    rng = np.random.default_rng(7)
    rows_per_shard = [(i % 3) + 1 for i in range(31)]  # 1..3 rows each
    for i, n in enumerate(rows_per_shard):
        table = pa.table({
            "image": [_jpeg_bytes(rng, 24, 24) for _ in range(n)],
            "caption": [[f"shard {i} row {r}"] for r in range(n)],
        })
        _write_arrow(tmp_path / f"gcc_{i}.arrow", table)

    ds = ImageTextArrowDataset(
        str(tmp_path), [f"gcc_{i}" for i in range(31)],
        transform=EvalTransform(16), tokenizer=get_tokenizer(),
        max_text_len=16,
    )
    assert len(ds) == sum(rows_per_shard)
    # first sample of shard 0, last sample of shard 30, and a middle boundary
    assert ds.get_raw_text(0) == "shard 0 row 0"
    assert ds.get_raw_text(len(ds) - 1) == f"shard 30 row {rows_per_shard[-1] - 1}"
    first_of_shard_1 = rows_per_shard[0]
    assert ds.get_raw_text(first_of_shard_1) == "shard 1 row 0"
    s = ds[len(ds) - 1]
    assert s["image_u8"].shape == (16, 16, 3)
