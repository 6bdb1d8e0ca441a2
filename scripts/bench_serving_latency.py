"""Serving latency sweep: the VQA endpoint across Predictor bucket sizes.

Production serving cares about tail latency at SMALL batches, not just
peak throughput — the Predictor (exploremultimodal_tpu/infer.py) pads
each request batch up to a power-of-two bucket, so the deployable
operating points are exactly the bucket shapes. This sweeps them for
bf16 and the fused W8A8 MLP kernel (`model.quantize=w8a8_pallas_mlp`)
and prints one JSON line per (mode, bucket):

  {"mode": ..., "bucket": N, "latency_ms": ..., "img_per_s": ...}

Run on the real chip (default env). ~10 jit compiles via the tunnel, so
expect several minutes of warmup before the timed sweeps.

Methodology: timing goes through the SHARED core
(exploremultimodal_tpu/utils/timing.py — readback-fenced timeit), the same
implementation bench.py uses, so sweep numbers and BENCHMARKS.json rows are
comparable by construction (round-3's ~9% dual-methodology discrepancy is
structurally closed); BENCHMARKS.json remains the source of truth for
headline claims.
"""

from __future__ import annotations

import json
import os
import sys

os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BUCKETS = (1, 8, 16, 32, 64)


def sweep(quant: str, n_warmup: int = 3, n_iters: int = 20) -> list[dict]:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from exploremultimodal_tpu.config import load_config
    from exploremultimodal_tpu.infer import _vqa_fn
    from exploremultimodal_tpu.models import build_model
    from exploremultimodal_tpu.models.task import VlmoTask
    from exploremultimodal_tpu.utils.timing import timeit

    cfg = load_config(
        ["model=vlmo_base", "train=finetune_vqa", "compute_dtype=bfloat16",
         "model.drop_rate=0.0", "model.attn_drop_rate=0.0",
         "model.drop_path_rate=0.0", f"model.quantize={quant}"]
    )
    task = build_model(cfg)
    c = task.config
    dummy = {
        "image": jnp.zeros((1, c.img_size, c.img_size, 3), jnp.float32),
        "text_ids": jnp.zeros((1, c.max_text_len), jnp.int32),
        "text_mask": jnp.ones((1, c.max_text_len), jnp.int32),
    }
    variables = task.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        dummy, method=VlmoTask.init_inference,
    )
    fwd = jax.jit(lambda v, i, t, m: task.apply(v, i, t, m, method=_vqa_fn))

    rng = np.random.default_rng(0)
    rows = []
    for b in BUCKETS:
        img = jnp.asarray(
            rng.integers(0, 256, (b, c.img_size, c.img_size, 3)), jnp.uint8)
        ids = jnp.asarray(
            rng.integers(0, 30522, (b, c.max_text_len)), jnp.int32)
        mask = jnp.ones((b, c.max_text_len), jnp.int32)
        dt = timeit(lambda: fwd(variables, img, ids, mask), n_warmup, n_iters)
        row = {"mode": quant, "bucket": b,
               "latency_ms": round(dt * 1e3, 2),
               "img_per_s": round(b / dt, 1)}
        print(json.dumps(row), flush=True)
        rows.append(row)
    return rows


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("EMM_JAX_CACHE", "/tmp/emm_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    all_rows = []
    for quant in ("none", "w8a8_pallas_mlp"):
        all_rows += sweep(quant)
    out = os.environ.get("SERVING_LATENCY_OUT", "")
    if out:
        with open(out, "w") as f:
            json.dump(all_rows, f, indent=2)


if __name__ == "__main__":
    main()
