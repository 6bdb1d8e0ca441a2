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
import random
import threading
from functools import lru_cache

import numpy as np

# serializes seeded draws through the HF collators' global-RNG dependency
_GLOBAL_RNG_LOCK = threading.Lock()

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

    def __call__(
        self, input_ids: np.ndarray, seed: int | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """(B, L) int ids → (ids_mlm, labels_mlm), labels −100 off-target.

        The HF collators draw from the GLOBAL numpy/python RNG. With `seed`
        (the caller's per-sample crc32 stream) the draw is isolated under a
        lock and the global state restored — per-sample masks become
        deterministic under multi-threaded loader workers, the thread-based
        equivalent of torch DataLoader's per-worker seeding."""
        rows = [list(row) for row in np.asarray(input_ids)]
        if seed is None:
            out = self.collator(rows)
        else:
            with _GLOBAL_RNG_LOCK:
                py_state = random.getstate()
                np_state = np.random.get_state()
                random.seed(seed)
                np.random.seed(seed % (2 ** 32))
                try:
                    out = self.collator(rows)
                finally:
                    random.setstate(py_state)
                    np.random.set_state(np_state)
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
