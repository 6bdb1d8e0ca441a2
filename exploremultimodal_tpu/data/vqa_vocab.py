"""VQAv2 answer vocabulary build/cache.

Reference parity: data/datamodules/vqav2_datamodule.py:23-81 — builds the
global answer2id/id2answer table (3129 classes) from the train+val answer
columns, caches to resource/vqa_dict.json, and injects it into datasets. The
shipped resource/vqa_dict.json is honored when present.
"""

from __future__ import annotations

import json
import os
from collections import Counter

from exploremultimodal_tpu.data.tokenization import DEFAULT_RESOURCE_DIR


def load_or_build_vqa_vocab(
    tables=None,
    cache_path: str | None = None,
    num_classes: int = 3129,
) -> dict:
    """Returns {'answer2id', 'id2answer', 'num_class'}."""
    cache_path = cache_path or os.path.join(DEFAULT_RESOURCE_DIR, "vqa_dict.json")
    if os.path.exists(cache_path):
        with open(cache_path) as f:
            d = json.load(f)
        ans2id = d.get("answer2id") or d.get("ans2id") or d
        id2ans = d.get("id2answer") or d.get("id2ans")
        if id2ans is None:
            id2ans = {str(v): k for k, v in ans2id.items()}
        return {
            "answer2id": ans2id,
            "id2answer": {int(k): v for k, v in id2ans.items()},
            "num_class": d.get("num_class", len(ans2id)),
        }

    if tables is None:
        raise FileNotFoundError(
            f"no cached vocab at {cache_path} and no tables to build from"
        )
    counter: Counter = Counter()
    for table in tables:
        for answers in table["answers"].to_pylist():
            for group in answers if isinstance(answers, list) else [answers]:
                for a in group if isinstance(group, list) else [group]:
                    counter[a] += 1
    most = [a for a, _ in counter.most_common(num_classes)]
    ans2id = {a: i for i, a in enumerate(most)}
    vocab = {
        "answer2id": ans2id,
        "id2answer": {i: a for a, i in ans2id.items()},
        "num_class": len(ans2id),
    }
    os.makedirs(os.path.dirname(cache_path), exist_ok=True)
    with open(cache_path, "w") as f:
        json.dump(
            {"answer2id": ans2id,
             "id2answer": {str(k): v for k, v in vocab["id2answer"].items()},
             "num_class": vocab["num_class"]},
            f,
        )
    return vocab
