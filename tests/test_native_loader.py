"""Native C++ data-loader core: decode parity, cropping, fault flags, speed."""

import io
import time

import numpy as np
import pytest
from PIL import Image

from exploremultimodal_tpu.data import native


pytestmark = pytest.mark.skipif(
    not native.build(), reason="native loader build failed (no g++/libjpeg)"
)


def _jpeg(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=95)
    return buf.getvalue()


def test_decode_matches_pil_exactly():
    """Same libjpeg underneath → identical decoded pixels (no resize)."""
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (64, 64, 3), np.uint8)
    data = _jpeg(arr)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))

    out1, out2, status = native.decode_resize_batch([data], size1=64)
    assert status[0] == 0
    assert out2 is None
    # identity-size bilinear resample == identity sampling grid
    np.testing.assert_array_equal(out1[0], pil)


def test_two_size_crop_outputs():
    rng = np.random.default_rng(1)
    arr = np.zeros((128, 128, 3), np.uint8)
    arr[:, 64:] = 255  # left black, right white
    data = _jpeg(arr)
    boxes = np.array([[0, 0, 128, 128]], np.int32)
    out1, out2, status = native.decode_resize_batch(
        [data], size1=32, size2=16, crop_boxes=boxes
    )
    assert out1.shape == (1, 32, 32, 3) and out2.shape == (1, 16, 16, 3)
    assert out1[0, :, :8].mean() < 30 and out1[0, :, -8:].mean() > 225
    assert out2[0, :, :4].mean() < 30 and out2[0, :, -4:].mean() > 225

    # crop the white half only → all bright at both sizes
    boxes = np.array([[64, 0, 64, 128]], np.int32)
    out1b, out2b, _ = native.decode_resize_batch(
        [data], size1=32, size2=16, crop_boxes=boxes
    )
    assert out1b.mean() > 225 and out2b.mean() > 225


def test_resize_close_to_pil_bilinear():
    rng = np.random.default_rng(2)
    arr = rng.integers(0, 256, (96, 80, 3), np.uint8)
    data = _jpeg(arr)
    out1, _, status = native.decode_resize_batch([data], size1=48)
    decoded = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    pil = np.asarray(
        Image.fromarray(decoded).resize((48, 48), Image.BILINEAR), np.float32
    )
    diff = np.abs(out1[0].astype(np.float32) - pil)
    assert diff.mean() < 3.0, diff.mean()


def test_corrupt_jpeg_flags_status_without_crashing():
    good = _jpeg(np.zeros((32, 32, 3), np.uint8))
    out1, _, status = native.decode_resize_batch(
        [b"definitely not a jpeg", good], size1=16
    )
    assert status.tolist() == [1, 0]
    assert out1[0].sum() == 0  # zero-filled


def test_batch_threads_and_throughput():
    rng = np.random.default_rng(3)
    datas = [
        _jpeg(rng.integers(0, 256, (256, 256, 3), np.uint8)) for _ in range(32)
    ]
    t0 = time.perf_counter()
    out1, out2, status = native.decode_resize_batch(
        datas, size1=224, size2=112, num_threads=8
    )
    native_dt = time.perf_counter() - t0
    assert status.sum() == 0
    assert out1.shape == (32, 224, 224, 3)

    t0 = time.perf_counter()
    for d in datas:
        img = Image.open(io.BytesIO(d)).convert("RGB")
        img.resize((224, 224), Image.BILINEAR)
        img.resize((112, 112), Image.BILINEAR)
    pil_dt = time.perf_counter() - t0
    # this container exposes a single vCPU, so the C++ thread pool cannot
    # demonstrate scaling here; require same order of magnitude and record
    assert native_dt < 3 * pil_dt, (native_dt, pil_dt)


def test_native_pretrain_transform_end_to_end(tmp_path):
    """native_loader=true drives the arrow dataset through the C++ path."""
    import pyarrow as pa

    from exploremultimodal_tpu.config import load_config
    from exploremultimodal_tpu.data import MultiTaskData

    rng = np.random.default_rng(0)
    table = pa.table({
        "image": [_jpeg(rng.integers(0, 256, (80, 96, 3), np.uint8))
                  for _ in range(3)],
        "caption": [["one"], ["two", "dos"], ["three"]],
    })
    root = tmp_path / "arrows"
    root.mkdir()
    with pa.OSFile(str(root / "coco_caption_karpathy_train.arrow"), "wb") as sink:
        with pa.ipc.new_file(sink, table.schema) as w:
            w.write_table(table)

    cfg = load_config([
        "model=vlmo_debug", "train=pretrain_mum", "train.datasets=[coco]",
        f"data.data_root={root}", "data.batch_size=4", "data.num_workers=1",
        "data.native_loader=true", "model.img_size=64",
        "data.num_mask_patches=2", "data.min_mask_patches_per_block=1",
        "model.max_text_len=8",
    ])
    data = MultiTaskData(cfg)
    batch = next(iter(data.train_loader()))
    assert batch["image_u8"].shape == (4, 64, 64, 3)
    assert batch["image4dalle_u8"].shape == (4, 32, 32, 3)
    assert batch["image_u8"].std() > 5  # real decoded content, not zeros
