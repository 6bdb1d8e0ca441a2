"""Endpoint-level int8 accuracy: bf16 vs w8a8_pallas_mlp (VERDICT r3 ask 3).

The +37% int8 serving win (BENCH.md) was justified by per-op error only;
this measures what a deployment cares about, on the real endpoints:

  vqa  — answer-FLIP RATE of infer._vqa_fn (argmax over the 3129-way head)
         between bf16 and the fused W8A8 MLP kernel, over >=1k samples,
         plus the per-sample max-relative-error distribution of the logits.
  mlm  — masked-position top-1 agreement of the 30522-way MLM head at the
         bert_mlm serving config (seq 196), same error distribution.

Weights are seeded-random (no trained checkpoints exist offline — flip rate
under random weights measures argmax sensitivity to the kernel's numerical
error at the true layer shapes; trained logits typically have LARGER argmax
margins, so this is the conservative direction). Run on the real chip:

  python scripts/measure_int8_accuracy.py            # both endpoints
  INT8_ACC_N=2048 python scripts/measure_int8_accuracy.py

Prints one JSON line per endpoint; recorded in BENCH.md §"int8 endpoint
accuracy". The CPU-interpret guard test lives in
tests/test_quant.py::test_w8a8_endpoint_agreement_guard.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build(quant: str, train: str, extra: list[str]):
    from exploremultimodal_tpu.config import load_config
    from exploremultimodal_tpu.models import build_model

    cfg = load_config([
        "model=vlmo_base", f"train={train}", "compute_dtype=bfloat16",
        "model.drop_rate=0.0", "model.attn_drop_rate=0.0",
        "model.drop_path_rate=0.0", f"model.quantize={quant}", *extra,
    ])
    return build_model(cfg)


def _rel_err(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Per-sample max |Δ| / max|ref| (scale-free rows protected)."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    denom = np.abs(a).max(axis=-1, keepdims=True) + 1e-9
    return (np.abs(a - b) / denom).max(axis=-1)


def measure_vqa(n_samples: int, batch: int) -> dict:
    import jax
    import jax.numpy as jnp

    from exploremultimodal_tpu.infer import _vqa_fn
    from exploremultimodal_tpu.models.task import VlmoTask

    task_bf16 = _build("none", "finetune_vqa", [])
    task_int8 = _build("w8a8_pallas_mlp", "finetune_vqa", [])
    c = task_bf16.config
    dummy = {
        "image": jnp.zeros((1, c.img_size, c.img_size, 3), jnp.float32),
        "text_ids": jnp.zeros((1, c.max_text_len), jnp.int32),
        "text_mask": jnp.ones((1, c.max_text_len), jnp.int32),
    }
    variables = task_bf16.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        dummy, method=VlmoTask.init_inference,
    )  # identical param tree for both (QuantDense == nn.Dense tree)

    f16 = jax.jit(lambda v, i, t, m: task_bf16.apply(v, i, t, m, method=_vqa_fn))
    f8 = jax.jit(lambda v, i, t, m: task_int8.apply(v, i, t, m, method=_vqa_fn))

    rng = np.random.default_rng(0)
    flips = 0
    margins_flipped = []
    rel_errs = []
    for start in range(0, n_samples, batch):
        b = min(batch, n_samples - start)
        img = jnp.asarray(
            rng.integers(0, 256, (b, c.img_size, c.img_size, 3)), jnp.uint8)
        ids = jnp.asarray(
            rng.integers(0, 30522, (b, c.max_text_len)), jnp.int32)
        mask = jnp.ones((b, c.max_text_len), jnp.int32)
        lo16 = np.asarray(f16(variables, img, ids, mask), np.float32)
        lo8 = np.asarray(f8(variables, img, ids, mask), np.float32)
        a16, a8 = lo16.argmax(-1), lo8.argmax(-1)
        flipped = a16 != a8
        flips += int(flipped.sum())
        # margin of the bf16 answer on flipped rows — how close were they
        srt = np.sort(lo16, axis=-1)
        margins_flipped += list((srt[:, -1] - srt[:, -2])[flipped])
        rel_errs += list(_rel_err(lo16, lo8))
    re = np.asarray(rel_errs)
    return {
        "endpoint": "vqa",
        "n": n_samples,
        "answer_flip_rate": round(flips / n_samples, 5),
        "flips": flips,
        "rel_err_median": round(float(np.median(re)), 5),
        "rel_err_p99": round(float(np.percentile(re, 99)), 5),
        "rel_err_max": round(float(re.max()), 5),
        "flipped_bf16_margin_median": round(
            float(np.median(margins_flipped)), 5) if margins_flipped else None,
    }


def measure_mlm(n_samples: int, batch: int) -> dict:
    import jax
    import jax.numpy as jnp

    from exploremultimodal_tpu.models.task import VlmoTask

    L = 196
    extra = [f"model.max_text_len={L}"]
    task_bf16 = _build("none", "pretrain_txt", extra)
    task_int8 = _build("w8a8_pallas_mlp", "pretrain_txt", extra)
    c = task_bf16.config
    rng = np.random.default_rng(1)
    init_batch = {
        "text_ids": jnp.zeros((1, L), jnp.int32),
        "text_ids_mlm": jnp.zeros((1, L), jnp.int32),
        "text_labels_mlm": jnp.full((1, L), -100, jnp.int32),
        "text_mask": jnp.ones((1, L), jnp.int32),
    }
    variables = task_bf16.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        init_batch, method=VlmoTask.init_streams,
    )

    def mlm_logits(task):
        def fn(v, ids, mask):
            out = task.apply(
                v, {"text_ids": ids, "text_mask": mask},
                infer_mode="txt_only", deterministic=True,
                method=VlmoTask.infer,
            )
            return task.apply(v, out["txt_feats"], method=VlmoTask.mlm_logits)
        return jax.jit(fn)

    f16 = mlm_logits(task_bf16)
    f8 = mlm_logits(task_int8)

    agree_sum = 0
    masked_total = 0
    rel_errs = []
    for start in range(0, n_samples, batch):
        b = min(batch, n_samples - start)
        ids = jnp.asarray(rng.integers(0, c.vocab_size, (b, L)), jnp.int32)
        mask = jnp.ones((b, L), jnp.int32)
        masked_pos = rng.random((b, L)) < 0.15
        lo16 = np.asarray(f16(variables, ids, mask), np.float32)
        lo8 = np.asarray(f8(variables, ids, mask), np.float32)
        p16, p8 = lo16.argmax(-1), lo8.argmax(-1)
        agree_sum += int(((p16 == p8) & masked_pos).sum())
        masked_total += int(masked_pos.sum())
        rel_errs += list(
            _rel_err(lo16[masked_pos], lo8[masked_pos])
        )
    re = np.asarray(rel_errs)
    return {
        "endpoint": "mlm_seq196",
        "n": n_samples,
        "masked_positions": masked_total,
        "top1_agreement": round(agree_sum / masked_total, 5),
        "rel_err_median": round(float(np.median(re)), 5),
        "rel_err_p99": round(float(np.percentile(re, 99)), 5),
        "rel_err_max": round(float(re.max()), 5),
    }


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("EMM_JAX_CACHE", "/tmp/emm_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    n = int(os.environ.get("INT8_ACC_N", "1024"))
    batch = int(os.environ.get("INT8_ACC_BATCH", "64"))
    which = os.environ.get("INT8_ACC_MODE", "vqa,mlm").split(",")
    rows = []
    if "vqa" in which:
        rows.append(measure_vqa(n, batch))
        print(json.dumps(rows[-1]), flush=True)
    if "mlm" in which:
        rows.append(measure_mlm(max(n // 4, 128), batch // 2))
        print(json.dumps(rows[-1]), flush=True)
    out = os.environ.get("INT8_ACC_OUT", "")
    if out:
        with open(out, "w") as f:
            json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
