"""Host-pipeline feed test: the REAL arrow data path feeding the chip.

All TPU benches use synthetic in-memory data; the classic failure mode of a
training stack is the host pipeline starving the chip (the reference built
DataLoaderX for exactly this — bg_dataloader.py:85-132). This measures the
full production path on the real chip (VERDICT r3 ask 5):

  multi-shard COCO-style .arrow fixtures (JPEG bytes + captions)
  → ShardedLoader workers (PIL or native C++ decode/augment)
  → per-sample WWM collation + blockwise masking
  → DeviceFeeder → the jitted pretrain_mum train step

and reports images/s plus the host-wait share (time blocked in next(batch)
vs total wall), next to the synthetic-data number from the same process.

  python scripts/bench_host_feed.py                 # PIL decode path
  HOSTFEED_NATIVE=1 python scripts/bench_host_feed.py  # native C++ loader
  HOSTFEED_WORKERS=8 HOSTFEED_N_IMG=1200 ...

Fixture: ~600 images, 640×480 JPEG (photo-ish gradients + noise — realistic
decode cost), 2 train shards, cached under /tmp/emm_hostfeed_arrow.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = os.environ.get("HOSTFEED_ARROW", "/tmp/emm_hostfeed_arrow")

WORDS = ("a man riding a horse on the beach near sunset with dogs and "
         "children playing in the golden sand while boats drift offshore "
         "under scattered clouds").split()


def _jpeg(rng: np.random.Generator, w=640, h=480) -> bytes:
    from PIL import Image

    # photo-ish content: smooth gradients + mild noise → realistic JPEG
    # entropy (pure noise over-prices decode, flat color under-prices it)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (
        120 + 60 * np.sin(xx / 97.0) + 50 * np.cos(yy / 61.0)
    )[..., None] + rng.normal(0, 12, (h, w, 3))
    arr = np.clip(base + rng.integers(-40, 40, (1, 1, 3)), 0, 255).astype(
        np.uint8
    )
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=90)
    return buf.getvalue()


def build_fixture(n_images: int) -> None:
    import pyarrow as pa

    os.makedirs(FIXTURE, exist_ok=True)
    marker = os.path.join(FIXTURE, f".ok_{n_images}")
    if os.path.exists(marker):
        return
    rng = np.random.default_rng(0)
    shards = {
        "coco_caption_karpathy_train": n_images * 2 // 3,
        "coco_caption_karpathy_restval": n_images - n_images * 2 // 3,
    }
    for name, n in shards.items():
        caps = [
            [" ".join(rng.choice(WORDS, size=rng.integers(8, 14)))]
            for _ in range(n)
        ]
        table = pa.table({
            "image": [_jpeg(rng) for _ in range(n)],
            "caption": caps,
        })
        with pa.OSFile(os.path.join(FIXTURE, f"{name}.arrow"), "wb") as sink:
            with pa.ipc.new_file(sink, table.schema) as writer:
                writer.write_table(table)
    open(marker, "w").close()


def run(datasets: str, n_steps: int, batch_size: int, workers: int,
        native: bool) -> dict:
    import jax.numpy as jnp

    import bench
    from exploremultimodal_tpu.utils.timing import sync

    trainer, state, batch0 = bench._trainer([
        "model=vlmo_base",
        "train=pretrain_mum",
        f"train.datasets=[{datasets}]",
        f"data.data_root={FIXTURE}",
        f"data.batch_size={batch_size}",
        f"data.synthetic_size={4 * batch_size}",
        f"data.num_workers={workers}",
        f"data.native_loader={'true' if native else 'false'}",
        "train.discrete_vae_type=random",
        "compute_dtype=bfloat16",
        "model.attn_drop_rate=0.0",
        "attn_impl=recompute",
        "train.warmup_steps=2",
        "exp_dir=/tmp/emm_hostfeed",
        "log_level=error",
    ])
    train_step = trainer.make_train_step()
    epoch = jnp.asarray(0.0)

    def batches():
        while True:  # re-iterate epochs so n_steps is shard-size-independent
            loader = trainer.data.train_loader()
            yield from trainer.feeder(iter(loader))

    it = batches()
    metrics = None
    for _ in range(3):  # warmup + compile
        state, metrics = train_step(state, next(it), epoch)
    sync(metrics["total_loss"])

    host_wait = 0.0
    t0 = time.perf_counter()
    for _ in range(n_steps):
        th = time.perf_counter()
        b = next(it)  # blocks iff the host pipeline is behind the chip
        host_wait += time.perf_counter() - th
        state, metrics = train_step(state, b, epoch)
    sync(metrics["total_loss"])
    total = time.perf_counter() - t0
    return {
        "datasets": datasets,
        "loader": "native" if native else "pil",
        "workers": workers,
        "batch_size": batch_size,
        "steps": n_steps,
        "img_per_s": round(n_steps * batch_size / total, 1),
        "step_ms": round(total / n_steps * 1e3, 1),
        "host_wait_ms_per_step": round(host_wait / n_steps * 1e3, 2),
        "host_wait_share_pct": round(100 * host_wait / total, 1),
    }


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("EMM_JAX_CACHE", "/tmp/emm_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    n_images = int(os.environ.get("HOSTFEED_N_IMG", "600"))
    n_steps = int(os.environ.get("HOSTFEED_STEPS", "20"))
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    workers = int(os.environ.get("HOSTFEED_WORKERS", "8"))
    native = os.environ.get("HOSTFEED_NATIVE", "") == "1"

    build_fixture(n_images)
    rows = [
        run("synthetic", n_steps, batch, workers, False),
        run("coco", n_steps, batch, workers, native),
    ]
    for r in rows:
        print(json.dumps(r), flush=True)
    out = os.environ.get("HOSTFEED_OUT", "")
    if out:
        with open(out, "w") as f:
            json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
