"""Compile-only memory analysis of the rematerialization modes.

Compiles the FULL vlmo_base batch-32 training step single-device for
parallel.remat = false / 'dots' / true and prints XLA's memory analysis
(temp = live activation workspace) plus FLOPs, quantifying the
save-everything / save-dots / save-block-inputs trade. Nothing executes, so
this runs on the 1-core CPU VM; the wall-clock A/B lives in BENCH.md.

Usage: python scripts/remat_memory_table.py  (self-provisions a CPU child)
Writes REMAT_MEMORY.json at the repo root and prints a markdown table.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

MODES = ["false", "dots", "true"]


def analyze(mode: str, batch_size: int) -> dict:
    import jax.numpy as jnp

    import bench

    trainer, state, batch = bench._trainer([
        "model=vlmo_base",
        "train=pretrain_mum",
        "train.datasets=[synthetic]",
        f"data.batch_size={batch_size}",
        f"data.synthetic_size={2 * batch_size}",
        "data.num_workers=2",
        "train.discrete_vae_type=random",
        "compute_dtype=bfloat16",
        "model.attn_drop_rate=0.0",
        "attn_impl=recompute",
        f"parallel.remat={mode}",
        "train.warmup_steps=2",
        "exp_dir=/tmp/emm_remat_mem",
        "log_level=error",
    ])
    step = trainer.make_train_step()
    compiled = step.lower(state, batch, jnp.asarray(0.0)).compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, list) else cost
    mem = compiled.memory_analysis()
    return {
        "remat": mode,
        "batch_size": batch_size,
        "flops": float(cost.get("flops", 0.0)),
        "bytes_accessed": float(cost.get("bytes accessed", 0.0)),
        "temp_size_bytes": getattr(mem, "temp_size_in_bytes", None),
        "argument_size_bytes": getattr(mem, "argument_size_in_bytes", None),
        "output_size_bytes": getattr(mem, "output_size_in_bytes", None),
    }


def main() -> None:
    if not os.environ.get("_EMM_REMAT_CHILD"):
        # compile-only on CPU by design; never touch the tunneled TPU plugin
        import subprocess

        env = dict(os.environ)
        env["_EMM_REMAT_CHILD"] = "1"
        env["JAX_PLATFORMS"] = "cpu"
        env["PALLAS_AXON_POOL_IPS"] = ""
        raise SystemExit(subprocess.run(
            [sys.executable, os.path.abspath(__file__), *sys.argv[1:]],
            env=env, cwd=REPO,
        ).returncode)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("EMM_JAX_CACHE", "/tmp/emm_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    batch_size = int(os.environ.get("BENCH_BATCH", "32"))
    rows = []
    for mode in (sys.argv[1:] or MODES):
        print(f"analyzing remat={mode}...", flush=True)
        rows.append(analyze(mode, batch_size))

    with open(os.path.join(REPO, "REMAT_MEMORY.json"), "w") as f:
        json.dump(rows, f, indent=2)

    print("\n| remat | step TFLOP | temp (activation) GB | vs false |")
    print("|---|---|---|---|")
    base = next((r for r in rows if r["remat"] == "false"), rows[0])
    for r in rows:
        t = r["temp_size_bytes"]
        rel = (f"{t / base['temp_size_bytes']:.2f}x"
               if t and base["temp_size_bytes"] else "?")
        print(f"| {r['remat']} | {r['flops']/1e12:.2f} | "
              f"{(t or 0)/1e9:.2f} | {rel} |")


if __name__ == "__main__":
    main()
