"""Host-side data-loader throughput: native C++ core vs PIL.

Measures JPEG decode + crop + two-size resize (224 / 112) images/sec on
synthetic 640×480 JPEGs — the DALI-analogue claim in PARITY.md §2.4.

Usage: python scripts/bench_native_loader.py [n_images] [n_threads]
"""

from __future__ import annotations

import io
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from PIL import Image  # noqa: E402

from exploremultimodal_tpu.data import native  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    threads = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rng = np.random.default_rng(0)
    bufs = []
    for _ in range(32):
        arr = rng.integers(0, 256, (480, 640, 3), np.uint8)
        b = io.BytesIO()
        Image.fromarray(arr).save(b, format="JPEG", quality=90)
        bufs.append(b.getvalue())
    bufs = (bufs * (n // len(bufs) + 1))[:n]

    if not native.is_available():
        native.build()
    native.decode_resize_batch(bufs[:8], 224, 112, num_threads=threads)  # warm
    t0 = time.perf_counter()
    out1, out2, status = native.decode_resize_batch(
        bufs, 224, 112, num_threads=threads
    )
    dt_native = time.perf_counter() - t0
    assert int(status.sum()) == 0 and out1.shape == (n, 224, 224, 3)

    t0 = time.perf_counter()
    for b in bufs:
        img = Image.open(io.BytesIO(b)).convert("RGB")
        np.asarray(img.resize((224, 224), Image.BICUBIC))
        np.asarray(img.resize((112, 112), Image.LANCZOS))
    dt_pil = time.perf_counter() - t0

    import os

    print(
        f"cores={os.cpu_count()} | native ({threads} threads): "
        f"{n / dt_native:.0f} img/s | PIL single-thread: {n / dt_pil:.0f} "
        f"img/s | speedup {dt_pil / dt_native:.1f}x "
        f"(thread-pool scaling needs >1 core)"
    )


if __name__ == "__main__":
    main()
