"""Measure MLM whole-word-masking overshoot vs the gather caps.

The fixed-shape masked-position gather (objectives/losses.py
`gather_masked_positions`) keeps only the first ceil(cap*L) masked positions
per row; positions beyond the cap fall out of the loss. MIM is provably safe
(the blockwise generator is budget-bounded at 75 <= cap*196 = 78,
data/masking.py:67-72). MLM under HF DataCollatorForWholeWordMask is NOT
bounded a priori: the collator masks ceil(0.15 * num_words) whole words and
every subword of each chosen word, so rows heavy in multi-subword words can
overshoot 15% of L. This script measures the actual masked-count
distribution per row and the overflow rate against `mlm_gather_cap` for the
shapes the benchmarks run (L=40 multimodal, L=196 bert_mlm, L=512 NLP), on

  - a natural-English corpus (prose sentences pulled from the repo's own
    markdown docs — same subword statistics as captions: common English),
  - a stress corpus (random alphanumeric "words", each tokenizing to many
    subwords — an adversarial upper bound no real caption corpus reaches).

Prints one JSON line per (corpus, L) with mean/p99/max masked counts, the
cap, and the measured overflow (dropped-position) rate. Results are recorded
in BENCH.md §"Gather-cap sizing".
"""

from __future__ import annotations

import glob
import json
import os
import re
import string
import sys

import numpy as np

os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exploremultimodal_tpu.data.tokenization import (  # noqa: E402
    MlmCollator,
    get_tokenizer,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def natural_sentences(n: int) -> list[str]:
    """English prose sentences from the repo's markdown docs."""
    text = ""
    for path in sorted(glob.glob(os.path.join(REPO, "*.md"))):
        with open(path, encoding="utf-8") as f:
            text += f.read() + "\n"
    # strip code/table/markdown machinery, keep prose-like lines
    lines = [
        re.sub(r"[`*#|\[\]()>{}]", " ", ln)
        for ln in text.splitlines()
        if len(ln.split()) >= 5
        and not ln.strip().startswith(("|", "```"))
        and not ln.startswith("    ")  # indented code lines (pre-strip)
    ]
    sents: list[str] = []
    for ln in lines:
        for s in re.split(r"(?<=[.!?])\s+", ln):
            if len(s.split()) >= 4:
                sents.append(s.strip())
    rng = np.random.default_rng(0)
    idx = rng.integers(0, len(sents), size=n)
    return [sents[i] for i in idx]


def stress_sentences(n: int, words_per_sent: int = 64) -> list[str]:
    """Random alphanumeric words — each tokenizes to many subwords, all of
    which get masked together under WWM. Adversarial upper bound."""
    rng = np.random.default_rng(1)
    alphabet = np.array(list(string.ascii_lowercase + string.digits))
    sents = []
    for _ in range(n):
        words = [
            "".join(rng.choice(alphabet, size=rng.integers(6, 14)))
            for _ in range(words_per_sent)
        ]
        sents.append(" ".join(words))
    return sents


def measure(corpus: str, sents: list[str], L: int, cap: float,
            n_trials: int = 4) -> dict:
    tok = get_tokenizer()
    collator = MlmCollator(tok, whole_word_masking=True, mlm_prob=0.15)
    enc = tok(sents, padding="max_length", truncation=True, max_length=L,
              return_tensors="np")
    ids = enc["input_ids"]
    k = max(1, min(L, int(np.ceil(cap * L))))
    counts = []
    for t in range(n_trials):
        for i in range(len(ids)):
            _, labels = collator(ids[i : i + 1], seed=1000 * t + i)
            counts.append(int((labels != -100).sum()))
    c = np.asarray(counts)
    overflow_rows = int((c > k).sum())
    dropped = int(np.maximum(c - k, 0).sum())
    return {
        "corpus": corpus,
        "L": L,
        "cap": cap,
        "k": k,
        "rows": len(c),
        "masked_mean": round(float(c.mean()), 2),
        "masked_p99": int(np.percentile(c, 99)),
        "masked_max": int(c.max()),
        "overflow_rows": overflow_rows,
        "overflow_rate": round(overflow_rows / len(c), 6),
        "dropped_positions": dropped,
        "dropped_rate": round(dropped / float(c.sum()), 6),
    }


def main() -> None:
    mlm_cap = 0.375  # config default mlm_gather_cap
    nat = natural_sentences(500)
    stress = stress_sentences(250)
    rows = []
    for L in (40, 196, 512):
        rows.append(measure("natural", nat, L, mlm_cap))
        rows.append(measure("stress", stress, L, mlm_cap))
    for r in rows:
        print(json.dumps(r), flush=True)
    out = os.environ.get("GATHER_CAP_OUT", "")
    if out:
        with open(out, "w") as f:
            json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
