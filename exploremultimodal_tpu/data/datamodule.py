"""Multi-dataset composition — the MTDataModule equivalent.

Reference parity: data/multitask_datamodule.py + datamodules/__init__.py
registry (vg, f30k, coco, gcc, sbu, vqa, nlvr2, book, wiki) +
datamodule_base.py construction of tokenizer / MLM collator / mask generator /
transforms. One `MultiTaskData(cfg)` builds concatenated train/val/test
datasets and sharded loaders.

Arrow table-name lists per dataset key mirror the reference's concrete
dataset classes (e.g. coco Karpathy train+restval; gcc 31 train shards; sbu 9
shards). A `synthetic` key provides the in-memory dataset for tests, smoke
runs, and benchmarks.
"""

from __future__ import annotations

import os
from typing import Any

from exploremultimodal_tpu.data.datasets import (
    ConcatDataset,
    ImageTextArrowDataset,
    ImgClsArrowDataset,
    Nlvr2ArrowDataset,
    RefGroundingArrowDataset,
    SyntheticDataset,
    TextCorpusDataset,
    VqaArrowDataset,
)
from exploremultimodal_tpu.data.masking import (
    MaskingGenerator,
    RegionMaskingGenerator,
)
from exploremultimodal_tpu.data.pipeline import ShardedLoader
from exploremultimodal_tpu.data.tokenization import MlmCollator, get_tokenizer
from exploremultimodal_tpu.data.transforms import (
    EvalTransform,
    FinetuneTransform,
    PretrainTransform,
)
from exploremultimodal_tpu.data.vqa_vocab import load_or_build_vqa_vocab

# arrow table names per (key, split) — reference data/datasets/*.py
ARROW_TABLES: dict[str, dict[str, list[str]]] = {
    "coco": {
        "train": ["coco_caption_karpathy_train", "coco_caption_karpathy_restval"],
        "val": ["coco_caption_karpathy_val"],
        "test": ["coco_caption_karpathy_test"],
    },
    "f30k": {
        "train": ["f30k_caption_karpathy_train"],
        "val": ["f30k_caption_karpathy_val"],
        "test": ["f30k_caption_karpathy_test"],
    },
    "vg": {"train": ["vg"], "val": [], "test": []},
    "gcc": {
        "train": [f"conceptual_caption_train_{i}" for i in range(31)],
        "val": ["conceptual_caption_val_0"],
        "test": [],
    },
    "sbu": {"train": [f"sbu_{i}" for i in range(9)], "val": [], "test": []},
    "vqa": {
        "train": ["vqav2_train", "vqav2_trainable_val"],
        "val": ["vqav2_rest_val"],
        "test": ["vqav2_test"],
    },
    "nlvr2": {
        "train": ["nlvr2_train"],
        "val": ["nlvr2_dev"],
        "test": ["nlvr2_dev", "nlvr2_test1"],
    },
    # image-classification arrows (image bytes + integer `label` column);
    # finetune_vis surface — no reference counterpart (its driver is a stub)
    "imgcls": {
        "train": ["imgcls_train"],
        "val": ["imgcls_val"],
        "test": ["imgcls_test"],
    },
    # referring-expression grounding arrows (image + caption expressions +
    # `ref_boxes` normalized cxcywh per expression); finetune_ref surface —
    # the reference driver (train/finetune/ref.py) is log-only
    "refcoco": {
        "train": ["refcoco_train"],
        "val": ["refcoco_val"],
        "test": ["refcoco_test"],
    },
}

NLP_KEYS = {"book": "bookcorpus", "wiki": "wikipedia"}


class MultiTaskData:
    """Builds per-key datasets, concatenates splits, hands out loaders."""

    def __init__(self, cfg: Any, phase: str | None = None):
        self.cfg = cfg
        d = cfg.data
        self.batch_size = d.batch_size
        self.eval_batch_size = d.get("eval_batch_size") or d.batch_size
        phase = phase or cfg.train.phase
        self.is_pretrain = phase.startswith("pretrain")
        # MIM in a finetune phase (finetune_inpainting) still needs the
        # pretrain-style two-resolution crop + patch masks + image4dalle
        self.masked_image = (
            self.is_pretrain or "mim" in set(cfg.train.loss_names)
        )

        self.tokenizer = get_tokenizer(d.tokenizer, d.get("tokenizer_dir"))
        self.mlm_collator = MlmCollator(
            self.tokenizer,
            whole_word_masking=d.whole_word_masking,
            mlm_prob=d.mlm_prob,
        )
        grid = d.img_size // d.patch_size
        if d.get("mask_style", "block") == "region":
            # one contiguous hole (finetune_inpainting recipe)
            self.mask_generator = RegionMaskingGenerator(
                grid, d.num_mask_patches
            )
        else:
            self.mask_generator = MaskingGenerator(
                grid,
                num_masking_patches=d.num_mask_patches,
                min_num_patches=d.get("min_mask_patches_per_block") or 4,
                max_num_patches=d.get("max_mask_patches_per_block"),
            )
        self.vqa_vocab = None

        keys = list(cfg.train.datasets)
        self.datasets = {
            split: ConcatDataset(
                [ds for k in keys for ds in [self._build(k, split)] if ds is not None and len(ds) > 0]
            )
            for split in ("train", "val", "test")
        }

    # ------------------------------------------------------------ builders

    def _transform(self, split: str):
        d = self.cfg.data
        second = d.img_size // 2 if self.masked_image else None
        if split == "train":
            if self.masked_image:
                if d.get("native_loader"):
                    from exploremultimodal_tpu.data.transforms import (
                        NativePretrainTransform,
                    )

                    return NativePretrainTransform(d.img_size, second)
                return PretrainTransform(d.img_size, second)
            return FinetuneTransform(d.img_size)
        return EvalTransform(d.img_size, second)

    def _build(self, key: str, split: str):
        d = self.cfg.data
        common = dict(
            tokenizer=self.tokenizer,
            max_text_len=self.cfg.model.max_text_len,
            mlm_collator=self.mlm_collator,
        )
        losses = set(self.cfg.train.loss_names)
        draw_false = (
            int(self.cfg.train.get("draw_false_text", 3)) if "irtr" in losses else 0
        )
        emit_aug = bool(self.cfg.get("vlmo_ema")) and split == "train"
        if key == "synthetic":
            vqa_size = d.vqav2_label_size if "vqa" in losses else None
            return SyntheticDataset(
                size=d.get("synthetic_size", 256),
                text_only=set(self.cfg.train.loss_names) <= {"mlm"}
                and "txt" in self.cfg.train.phase,
                img_size=d.img_size,
                second_size=d.img_size // 2 if self.masked_image else None,
                max_text_len=self.cfg.model.max_text_len,
                vocab_size=self.cfg.model.vocab_size,
                patch_grid=d.img_size // d.patch_size,
                num_mask_patches=d.num_mask_patches,
                vqa_label_size=vqa_size,
                nlvr="nlvr2" in losses,
                draw_false_text=draw_false,
                mpp_labels="mpp" in losses,
                emit_image_aug=emit_aug,
                num_classes=(
                    int(self.cfg.model.get("num_classes") or 1000)
                    if "imgcls" in losses else None
                ),
                ref_boxes="refcoco" in losses,
                # honor data.mask_style (region masks for inpainting)
                mask_generator=(
                    self.mask_generator if self.masked_image else None
                ),
            )
        if key in NLP_KEYS:
            path = os.path.join(d.data_root, NLP_KEYS[key])
            if not os.path.exists(path):
                return None
            # reference packs NLP corpora to 512 tokens; the model's position
            # table must cover it — fail loudly rather than silently packing
            # to 40 or clamping position embeddings
            nlp_len = int(d.get("nlp_max_text_len") or 512)
            if nlp_len > self.cfg.model.max_text_len:
                raise ValueError(
                    f"NLP corpora pack to {nlp_len} tokens but "
                    f"model.max_text_len={self.cfg.model.max_text_len}; launch "
                    f"pretrain_txt with model.max_text_len={nlp_len} (or set "
                    f"data.nlp_max_text_len)"
                )
            return TextCorpusDataset(
                path, split=split,
                tokenizer=self.tokenizer,
                max_text_len=nlp_len,
                mlm_collator=self.mlm_collator,
            )
        tables = ARROW_TABLES.get(key, {}).get(split, [])
        tables = [
            t for t in tables
            if os.path.exists(os.path.join(d.data_root, f"{t}.arrow"))
        ]
        if not tables:
            return None
        if key == "vqa":
            if self.vqa_vocab is None:
                self.vqa_vocab = load_or_build_vqa_vocab()
            return VqaArrowDataset(
                d.data_root, tables, split=split,
                transform=self._transform(split),
                mask_generator=self.mask_generator if self.masked_image else None,
                label_size=d.vqav2_label_size,
                answer_vocab=self.vqa_vocab,
                **common,
            )
        if key == "nlvr2":
            return Nlvr2ArrowDataset(
                d.data_root, tables, split=split,
                transform=self._transform(split),
                **common,
            )
        if key == "imgcls":
            return ImgClsArrowDataset(
                d.data_root, tables, split=split,
                transform=self._transform(split),
                **common,
            )
        if key == "refcoco":
            # plain resize for every split: normalized boxes stay valid
            # without box-aware crop augmentation (datasets.py note)
            return RefGroundingArrowDataset(
                d.data_root, tables, split=split,
                transform=EvalTransform(d.img_size),
                **common,
            )
        return ImageTextArrowDataset(
            d.data_root, tables, split=split,
            transform=self._transform(split),
            mask_generator=self.mask_generator if self.masked_image else None,
            image_only=d.get("image_only", False),
            draw_false_text=draw_false if split == "train" else 0,
            emit_image_aug=emit_aug and self.is_pretrain,
            **common,
        )

    # ------------------------------------------------------------- loaders

    def _loader(self, split: str, shuffle: bool) -> ShardedLoader:
        d = self.cfg.data
        return ShardedLoader(
            self.datasets[split],
            self.batch_size if split == "train" else self.eval_batch_size,
            shuffle=shuffle,
            seed=self.cfg.seed,
            num_workers=d.get("num_workers", 8),
            prefetch=d.get("prefetch_depth", 4),
            drop_last=split == "train",
        )

    def train_loader(self) -> ShardedLoader:
        return self._loader("train", shuffle=True)

    def val_loader(self) -> ShardedLoader:
        return self._loader("val", shuffle=False)

    def test_loader(self) -> ShardedLoader:
        return self._loader("test", shuffle=False)
