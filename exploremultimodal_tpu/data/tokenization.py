"""Tokenizer + MLM / whole-word-masking collation.

Reference parity: data/datamodules/datamodule_base.py:40-46,109-130 — a BERT
tokenizer loaded from the local resource dir and HF's whole-word-mask /
token-level MLM collators (mlm_prob 0.15). The HF collators are reused
directly (host-side data prep; their subword-grouping rules define MLM-target
parity), wrapped to emit numpy with the reference's field contract:
text_ids_mlm + text_labels_mlm (−100 at unmasked positions).
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np

DEFAULT_RESOURCE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "resource",
)


@lru_cache(maxsize=4)
def get_tokenizer(name: str = "bert-base-uncased", resource_dir: str | None = None):
    from transformers import BertTokenizerFast

    for root in (resource_dir, DEFAULT_RESOURCE_DIR):
        if root is None:
            continue
        local = os.path.join(root, name)
        if os.path.isdir(local):
            return BertTokenizerFast.from_pretrained(local)
    # no local copy — go to the hub (fails fast offline rather than retrying)
    os.environ.setdefault("HF_HUB_OFFLINE", "0")
    return BertTokenizerFast.from_pretrained(name)


class MlmCollator:
    """Per-sample MLM target generation (reference base_dataset.py:129-136
    runs the HF collator one sample at a time)."""

    def __init__(
        self,
        tokenizer,
        whole_word_masking: bool = True,
        mlm_prob: float = 0.15,
    ):
        from transformers import (
            DataCollatorForLanguageModeling,
            DataCollatorForWholeWordMask,
        )

        cls = (
            DataCollatorForWholeWordMask
            if whole_word_masking
            else DataCollatorForLanguageModeling
        )
        self.collator = cls(
            tokenizer=tokenizer, mlm=True, mlm_probability=mlm_prob,
            return_tensors="np",
        )

    def __call__(self, input_ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(B, L) int ids → (ids_mlm, labels_mlm), labels −100 off-target."""
        out = self.collator([list(row) for row in np.asarray(input_ids)])
        return np.asarray(out["input_ids"]), np.asarray(out["labels"])


def encode_texts(
    tokenizer,
    texts: list[str],
    max_len: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Fixed-length tokenize (base_dataset.py:110-127 semantics:
    padding='max_length', truncation=True)."""
    enc = tokenizer(
        texts,
        padding="max_length",
        truncation=True,
        max_length=max_len,
        return_tensors="np",
    )
    return enc["input_ids"].astype(np.int32), enc["attention_mask"].astype(np.int32)
