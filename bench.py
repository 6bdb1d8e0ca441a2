"""Headline benchmark: fused dVAE tokenization + VLMo-Base pretrain step.

Measures images/sec/chip for the full jitted multitask training step
(BASELINE.json metric): on-device uint8 preprocess → frozen DALL-E dVAE
tokenization (112×112 → 14×14 codes) → VLMo-Base MLM+ITC+ITM+MIM forwards →
backward → AdamW update. Prints ONE JSON line.

vs_baseline: ratio against an estimated A100 reference throughput for the
same step (the reference publishes no numbers — BASELINE.md). The estimate
(150 img/s/chip) assumes the reference's fp16 torch stack at ~40% MFU on
A100's 312 TFLOP/s over the ~5 backbone forwards + dVAE conv encoder this
step performs; see BENCH.md for the derivation.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

A100_BASELINE_IPS = 150.0


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from exploremultimodal_tpu.config import load_config
    from exploremultimodal_tpu.train.trainer import Trainer

    batch_size = int(os.environ.get("BENCH_BATCH", "32"))
    n_warmup = int(os.environ.get("BENCH_WARMUP", "3"))
    n_iters = int(os.environ.get("BENCH_ITERS", "10"))
    model = os.environ.get("BENCH_MODEL", "vlmo_base")

    cfg = load_config(
        [
            f"model={model}",
            "train=pretrain_mum",
            "train.datasets=[synthetic]",
            f"data.batch_size={batch_size}",
            f"data.synthetic_size={4 * batch_size}",
            "data.num_workers=4",
            "train.discrete_vae_type=random",
            "compute_dtype=bfloat16",
            "attn_impl=pallas",
            "train.warmup_steps=2",
            "exp_dir=/tmp/emm_bench",
            "log_level=error",
        ]
    )
    trainer = Trainer(cfg)
    loader = trainer.data.train_loader()
    batch = next(iter(trainer.feeder(iter(loader))))
    state = trainer.init_state(batch)
    train_step = trainer.make_train_step()
    epoch = jnp.asarray(0.0)

    for _ in range(n_warmup):
        state, metrics = train_step(state, batch, epoch)
    jax.block_until_ready(metrics)

    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, metrics = train_step(state, batch, epoch)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0

    n_chips = jax.device_count()
    ips_per_chip = n_iters * batch_size / dt / n_chips
    result = {
        "metric": "vlmo_base_pretrain_step_images_per_sec_per_chip",
        "value": round(ips_per_chip, 2),
        "unit": "images/s/chip",
        "vs_baseline": round(ips_per_chip / A100_BASELINE_IPS, 3),
        "detail": {
            "batch_size": batch_size,
            "step_ms": round(dt / n_iters * 1000, 1),
            "chips": n_chips,
            "platform": jax.devices()[0].platform,
            "losses": "mlm+itc+itm+mim (incl. dVAE tokenize)",
            "total_loss": round(float(metrics["total_loss"]), 3),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
