"""Datasets: pyarrow-backed image-text, HF text corpora, and synthetic.

Reference parity:
  - ImageTextArrowDataset ≙ data/datasets/base_dataset.py (memory-mapped
    {name}.arrow RecordBatch files, (image, caption_j) index flattening,
    decode-error resampling, per-sample MLM collation + blockwise image mask)
  - TextCorpusDataset ≙ data/datasets/base_nlp_dataset.py (load_from_disk
    corpora, deterministic 80/10/10 split, greedy ' [SEP] ' sequence packing)
  - VqaArrowDataset / Nlvr2ArrowDataset ≙ vqav2_dataset.py / nlvr2_dataset.py
  - SyntheticDataset: in-memory stand-in with the exact batch contract, for
    tests, benchmarks, and smoke training (the reference has no equivalent —
    SURVEY.md §4 lists this as a gap to fill)

All datasets emit numpy sample dicts with uint8 image crops; normalization
happens on device (ops/preprocess.py).
"""

from __future__ import annotations

import io
import random
import zlib
from typing import Any, Callable, Sequence

import numpy as np

from exploremultimodal_tpu.data.masking import MaskingGenerator
from exploremultimodal_tpu.data.tokenization import MlmCollator, encode_texts
from exploremultimodal_tpu.data.transforms import (
    EvalTransform,
    PretrainTransform,
)

Sample = dict[str, Any]


class ImageTextArrowDataset:
    """Memory-mapped pyarrow image-text dataset (base_dataset.py:11-172)."""

    def __init__(
        self,
        data_root: str,
        names: Sequence[str],
        *,
        split: str = "train",
        transform=None,
        tokenizer=None,
        max_text_len: int = 40,
        text_column: str = "caption",
        mlm_collator: MlmCollator | None = None,
        mask_generator: MaskingGenerator | None = None,
        image_only: bool = False,
        text_only: bool = False,
        draw_false_text: int = 0,
        emit_image_aug: bool = False,
        extra_columns: Sequence[str] = (),
    ):
        import pyarrow as pa

        self.split = split
        self.transform = transform
        self.tokenizer = tokenizer
        self.max_text_len = max_text_len
        self.text_column = text_column
        self.mlm_collator = mlm_collator
        self.mask_generator = mask_generator
        self.image_only = image_only
        self.text_only = text_only
        self.draw_false_text = draw_false_text
        self.emit_image_aug = emit_image_aug
        self.extra_columns = list(extra_columns)

        tables = []
        for name in names:
            path = f"{data_root}/{name}.arrow"
            with pa.memory_map(path, "r") as source:
                tables.append(pa.ipc.open_file(source).read_all())
        self.table = pa.concat_tables(tables, promote_options="default") if len(tables) > 1 else tables[0]

        # flatten (image row, caption j) pairs (base_dataset.py:69-79)
        self.index_mapper: list[tuple[int, int]] = []
        if text_column in self.table.column_names and not image_only:
            captions = self.table[text_column].to_pylist()
            for row, caps in enumerate(captions):
                caps = caps if isinstance(caps, list) else [caps]
                for j in range(len(caps)):
                    self.index_mapper.append((row, j))
            self._captions = captions
        else:
            self.index_mapper = [(row, 0) for row in range(self.table.num_rows)]
            self._captions = None

    def __len__(self) -> int:
        return len(self.index_mapper)

    def _decode_image(self, row: int):
        from PIL import Image

        data = self.table["image"][row].as_py()
        return Image.open(io.BytesIO(data))

    def get_raw_text(self, index: int) -> str:
        row, j = self.index_mapper[index]
        caps = self._captions[row]
        return caps[j] if isinstance(caps, list) else caps

    def _load_view(self, row: int, rng: random.Random):
        """One augmented view of an image row: (image, image4dalle|None)."""
        if hasattr(self.transform, "from_bytes"):
            out = self.transform.from_bytes(self.table["image"][row].as_py(), rng)
        else:
            img = self._decode_image(row)
            out = self.transform(img, rng) if self.transform else np.asarray(img)
        return out if isinstance(out, tuple) else (out, None)

    def get_sample(self, index: int, rng: random.Random) -> Sample:
        row, _ = self.index_mapper[index]
        sample: Sample = {"index": index}

        if not self.text_only:
            image, image4dalle = self._load_view(row, rng)
            sample["image_u8"] = image
            if image4dalle is not None:
                sample["image4dalle_u8"] = image4dalle
            if self.emit_image_aug:
                # second INDEPENDENT augmented view for the momentum branch
                # (base_dataset.py:88-108 emits image_aug alongside image)
                sample["image_aug_u8"] = self._load_view(row, rng)[0]
            if self.mask_generator is not None:
                np_rng = np.random.default_rng(rng.getrandbits(32))
                sample["image_bool_masked_pos"] = self.mask_generator(
                    np_rng
                ).reshape(-1)

        if not self.image_only and self._captions is not None:
            text = self.get_raw_text(index)
            ids, mask = encode_texts(self.tokenizer, [text], self.max_text_len)
            sample["text_ids"] = ids[0]
            sample["text_mask"] = mask[0]
            if self.mlm_collator is not None:
                # per-sample seed: thread-safe deterministic masks (the HF
                # collator otherwise consumes the process-global RNG)
                ids_mlm, labels = self.mlm_collator(
                    ids, seed=rng.getrandbits(32)
                )
                sample["text_ids_mlm"] = ids_mlm[0].astype(np.int32)
                sample["text_labels_mlm"] = labels[0].astype(np.int32)

        if self.draw_false_text > 0:
            # negative captions for retrieval ranking (reference draws
            # false_text_{i} per sample; train/finetune retrieval recipe)
            ids_list, mask_list = [], []
            for _ in range(self.draw_false_text):
                j = rng.randrange(len(self))
                f_ids, f_mask = encode_texts(
                    self.tokenizer, [self.get_raw_text(j)], self.max_text_len
                )
                ids_list.append(f_ids[0])
                mask_list.append(f_mask[0])
            sample["false_text_ids"] = np.stack(ids_list)
            sample["false_text_mask"] = np.stack(mask_list)

        for col in self.extra_columns:
            sample[col] = self.table[col][row].as_py()
        return sample

    # epoch is set by the loader (ShardedLoader.set_epoch) so augmentations
    # and masks differ every epoch; crc32 keeps per-sample seeds stable
    # across processes and restarts (unlike hash(), which is salted)
    epoch: int = 0

    def __getitem__(self, index: int) -> Sample:
        """Corrupt-sample fault tolerance: resample a random index on decode
        error (base_dataset.py:146-160)."""
        seed = zlib.crc32(f"{self.split}:{index}:{self.epoch}".encode())
        rng = random.Random(seed)
        for _ in range(10):
            try:
                return self.get_sample(index, rng)
            except Exception:
                index = rng.randrange(len(self))
        raise RuntimeError("too many corrupt samples")


class VqaArrowDataset(ImageTextArrowDataset):
    """VQAv2 (vqav2_dataset.py:6-66): question text + soft (3129,) targets."""

    def __init__(self, *args, answer_vocab: dict | None = None,
                 label_size: int = 3129, **kw):
        kw.setdefault("text_column", "questions")
        kw.setdefault("extra_columns", ())
        super().__init__(*args, **kw)
        self.answer_vocab = answer_vocab or {}
        self.label_size = label_size

    def get_sample(self, index: int, rng: random.Random) -> Sample:
        sample = super().get_sample(index, rng)
        row, j = self.index_mapper[index]
        targets = np.zeros(self.label_size, np.float32)
        if "answer_labels" in self.table.column_names:
            labels = self.table["answer_labels"][row].as_py()[j]
            scores = self.table["answer_scores"][row].as_py()[j]
            for lab, sc in zip(labels, scores):
                targets[lab] = sc
        sample["vqa_targets"] = targets
        if "question_id" in self.table.column_names:
            qid = self.table["question_id"][row].as_py()
            sample["qid"] = np.int64(qid[j] if isinstance(qid, list) else qid)
        return sample


class RefGroundingArrowDataset(ImageTextArrowDataset):
    """Referring-expression grounding arrows (finetune_ref surface; the
    reference driver train/finetune/ref.py is log-only and ships no
    dataset): image bytes + `caption` referring expressions + a
    `ref_boxes` column of one normalized (cx, cy, w, h) box per
    expression. Boxes are image-relative, so the plain-resize transform
    (EvalTransform) keeps them valid without box-aware augmentation."""

    def get_sample(self, index: int, rng: random.Random) -> Sample:
        sample = super().get_sample(index, rng)
        row, j = self.index_mapper[index]
        box = self.table["ref_boxes"][row].as_py()[j]
        sample["ref_box"] = np.asarray(box, np.float32)
        return sample


class ImgClsArrowDataset(ImageTextArrowDataset):
    """Image-classification arrow dataset: `image` bytes + integer `label`
    column (finetune_vis surface — the reference's train/finetune/vis.py is a
    log-only stub with no dataset; this makes the phase runnable)."""

    def __init__(self, *args, **kw):
        kw.setdefault("image_only", True)
        super().__init__(*args, **kw)

    def get_sample(self, index: int, rng: random.Random) -> Sample:
        sample = super().get_sample(index, rng)
        row, _ = self.index_mapper[index]
        sample["label"] = np.int32(self.table["label"][row].as_py())
        return sample


class Nlvr2ArrowDataset(ImageTextArrowDataset):
    """NLVR2 (nlvr2_dataset.py:8-61): image_0/image_1 pair + bool answer."""

    def __init__(self, *args, **kw):
        kw.setdefault("text_column", "questions")
        super().__init__(*args, **kw)

    def get_sample(self, index: int, rng: random.Random) -> Sample:
        from PIL import Image

        row, j = self.index_mapper[index]
        sample: Sample = {"index": index}
        for i in (0, 1):
            data = self.table[f"image_{i}"][row].as_py()
            img = Image.open(io.BytesIO(data))
            out = self.transform(img, rng) if self.transform else np.asarray(img)
            sample[f"image_{i}_u8"] = out[0] if isinstance(out, tuple) else out
        text = self.get_raw_text(index)
        ids, mask = encode_texts(self.tokenizer, [text], self.max_text_len)
        sample["text_ids"] = ids[0]
        sample["text_mask"] = mask[0]
        answers = self.table["answers"][row].as_py()
        ans = answers[j] if isinstance(answers, list) else answers
        sample["answers"] = np.int32(bool(ans))
        if "table_name" in self.table.column_names:
            sample["table_name"] = self.table["table_name"][row].as_py()
        return sample


class TextCorpusDataset:
    """HF-datasets text corpus with greedy sequence packing
    (base_nlp_dataset.py:9-120): append texts joined by ' [SEP] ' until
    max_text_len fills; deterministic 80/10/10 split."""

    def __init__(
        self,
        data_dir: str,
        *,
        split: str = "train",
        tokenizer=None,
        max_text_len: int = 512,
        mlm_collator: MlmCollator | None = None,
        text_column: str = "text",
        pack_ratio: int = 4,
    ):
        from datasets import load_from_disk

        ds = load_from_disk(data_dir)
        if hasattr(ds, "keys") and "train" in ds:
            ds = ds["train"]
        n = len(ds)
        rng = np.random.default_rng(0)
        perm = rng.permutation(n)
        bounds = {"train": (0, int(0.8 * n)), "val": (int(0.8 * n), int(0.9 * n)),
                  "test": (int(0.9 * n), n)}
        lo, hi = bounds[split]
        self.split = split
        self.indices = perm[lo:hi]
        self.ds = ds
        self.text_column = text_column
        self.tokenizer = tokenizer
        self.max_text_len = max_text_len
        self.mlm_collator = mlm_collator
        self.pack_ratio = pack_ratio

    def __len__(self) -> int:
        return max(len(self.indices) // self.pack_ratio, 1)

    # set by ShardedLoader.set_epoch, like BaseDataset: MLM masks differ
    # per epoch but are deterministic per (split, index, epoch)
    epoch: int = 0

    def __getitem__(self, index: int) -> Sample:
        # pack consecutive texts until the token budget fills
        parts: list[str] = []
        used = 0
        i = index * self.pack_ratio
        while i < len(self.indices) and used < self.max_text_len:
            text = self.ds[int(self.indices[i])][self.text_column]
            parts.append(text)
            used += len(self.tokenizer.tokenize(text)) + 1
            i += 1
        packed = " [SEP] ".join(parts)
        ids, mask = encode_texts(self.tokenizer, [packed], self.max_text_len)
        sample: Sample = {"text_ids": ids[0], "text_mask": mask[0]}
        if self.mlm_collator is not None:
            seed = zlib.crc32(f"{self.split}:{index}:{self.epoch}".encode())
            ids_mlm, labels = self.mlm_collator(ids, seed=seed)
            sample["text_ids_mlm"] = ids_mlm[0].astype(np.int32)
            sample["text_labels_mlm"] = labels[0].astype(np.int32)
        return sample


class SyntheticDataset:
    """Deterministic in-memory dataset with the full pretrain batch contract."""

    def __init__(
        self,
        size: int = 256,
        *,
        img_size: int = 224,
        second_size: int | None = 112,
        max_text_len: int = 40,
        vocab_size: int = 30522,
        patch_grid: int = 14,
        num_mask_patches: int = 75,
        min_mask_per_block: int = 16,
        vqa_label_size: int | None = None,
        nlvr: bool = False,
        text_only: bool = False,
        draw_false_text: int = 0,
        mpp_labels: bool = False,
        emit_image_aug: bool = False,
        num_classes: int | None = None,
        ref_boxes: bool = False,
        mask_generator=None,  # override (e.g. region masks for inpainting)
        seed: int = 0,
    ):
        self.size = size
        self.img_size = img_size
        self.second_size = second_size
        self.max_text_len = max_text_len
        self.vocab_size = vocab_size
        self.seed = seed
        self.vqa_label_size = vqa_label_size
        self.nlvr = nlvr
        self.text_only = text_only
        self.draw_false_text = draw_false_text
        self.mpp_labels = mpp_labels
        self.emit_image_aug = emit_image_aug
        self.num_classes = num_classes
        self.ref_boxes = ref_boxes
        self.mask_generator = mask_generator or MaskingGenerator(
            patch_grid, num_mask_patches,
            min_num_patches=min(min_mask_per_block, num_mask_patches),
        )

    def __len__(self) -> int:
        return self.size

    def __getitem__(self, index: int) -> Sample:
        rng = np.random.default_rng(self.seed * 100003 + index)
        L = self.max_text_len
        ids = rng.integers(1000, self.vocab_size, (L,)).astype(np.int32)
        ids[0], ids[-1] = 101, 102  # [CLS] ... [SEP]
        n_valid = int(rng.integers(L // 2, L + 1))
        mask = np.zeros(L, np.int32)
        mask[:n_valid] = 1

        ids_mlm = ids.copy()
        labels = np.full(L, -100, np.int32)
        mlm_pos = (rng.random(L) < 0.15) & (mask > 0)
        mlm_pos[0] = False
        labels[mlm_pos] = ids[mlm_pos]
        ids_mlm[mlm_pos] = 103  # [MASK]

        sample: Sample = {
            "index": np.int64(index),
            "text_ids": ids,
            "text_mask": mask,
            "text_ids_mlm": ids_mlm,
            "text_labels_mlm": labels,
        }
        if self.text_only:
            return sample
        sample["image_u8"] = rng.integers(
            0, 256, (self.img_size, self.img_size, 3), dtype=np.uint8
        )
        if self.emit_image_aug:
            sample["image_aug_u8"] = rng.integers(
                0, 256, (self.img_size, self.img_size, 3), dtype=np.uint8
            )
        if self.num_classes:
            sample["label"] = np.int32(rng.integers(0, self.num_classes))
        sample["image_bool_masked_pos"] = self.mask_generator(rng).reshape(-1)
        if self.second_size:
            sample["image4dalle_u8"] = rng.integers(
                0, 256, (self.second_size, self.second_size, 3), dtype=np.uint8
            )
        if self.vqa_label_size:
            t = np.zeros(self.vqa_label_size, np.float32)
            t[rng.integers(0, self.vqa_label_size)] = 1.0
            sample["vqa_targets"] = t
        if self.draw_false_text:
            L = self.max_text_len
            sample["false_text_ids"] = rng.integers(
                1000, self.vocab_size, (self.draw_false_text, L)
            ).astype(np.int32)
            sample["false_text_mask"] = np.ones(
                (self.draw_false_text, L), np.int32
            )
        if self.mpp_labels:
            n_patches = sample["image_bool_masked_pos"].shape[0]
            labels = rng.integers(0, 256, (n_patches, 3)).astype(np.int32)
            labels[sample["image_bool_masked_pos"] == 0] = -100
            sample["image_labels_mpp"] = labels
        if self.ref_boxes:
            # normalized cxcywh with the whole box inside the image
            w, h = rng.uniform(0.1, 0.5, 2)
            cx = rng.uniform(w / 2, 1 - w / 2)
            cy = rng.uniform(h / 2, 1 - h / 2)
            sample["ref_box"] = np.asarray([cx, cy, w, h], np.float32)
        if self.nlvr:
            sample["image_0_u8"] = sample["image_u8"]
            sample["image_1_u8"] = rng.integers(
                0, 256, (self.img_size, self.img_size, 3), dtype=np.uint8
            )
            sample["answers"] = np.int32(rng.integers(0, 2))
        return sample


class ConcatDataset:
    """torch.utils.data.ConcatDataset equivalent (MTDataModule concatenation)."""

    def __init__(self, datasets: Sequence[Any]):
        self.datasets = list(datasets)
        self.offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self) -> int:
        return int(self.offsets[-1])

    def __getitem__(self, index: int) -> Sample:
        d = int(np.searchsorted(self.offsets, index, side="right") - 1)
        return self.datasets[d][index - int(self.offsets[d])]
