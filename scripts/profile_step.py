"""Capture a jax.profiler trace of the headline pretrain step and print a
per-fusion-category time table (the round-2/3 perf methodology: BENCH.md).

Usage:  python scripts/profile_step.py            # b32 headline config
        BENCH_BATCH=64 python scripts/profile_step.py
Writes the raw trace under /tmp/emm_trace for TensorBoard/XProf; prints the
top individual ops and a category rollup (matmul fusions / loop fusions /
rng+dropout / copies / convs / other) to stdout.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

TRACE_DIR = os.environ.get("EMM_TRACE_DIR", "/tmp/emm_trace")


import re


def build_hlo_map(hlo: str) -> dict:
    """instruction name -> (category, source-op_name hint) from compiled HLO.

    Fusions are classified by their fused computation's contents (dot/conv/
    rng inside), everything else by opcode; the metadata op_name ties the
    time back to model code (e.g. '...VlmoTask.infer/.../attn/...')."""
    # fused computations: which contain dot / conv / rng?
    comp_kind: dict[str, str] = {}
    cur = None
    for line in hlo.splitlines():
        m = re.match(r"%?([\w.\-]+)\s*(?:\([^)]*\))?\s*->.*{$|^ *%?([\w.\-]+) \(", line)
        if line.startswith("%fused_"):
            cur = line.split()[0].lstrip("%").split("(")[0].strip()
            comp_kind[cur] = "elementwise"
            continue
        if line.startswith("}"):
            cur = None
            continue
        if cur:
            if " dot(" in line or " dot-start(" in line:
                comp_kind[cur] = "matmul"
            elif " convolution(" in line and comp_kind[cur] != "matmul":
                comp_kind[cur] = "conv"
            elif (" rng-bit-generator(" in line
                  and comp_kind[cur] == "elementwise"):
                comp_kind[cur] = "rng"

    out: dict[str, tuple[str, str]] = {}
    for line in hlo.splitlines():
        m = re.match(r"\s+(?:ROOT )?%?([\w.\-]+) = .+? ([a-z\-]+)\(", line)
        if not m:
            continue
        name, opcode = m.groups()
        src = ""
        mm = re.search(r'op_name="([^"]+)"', line)
        if mm:
            src = mm.group(1)
        if opcode == "fusion":
            mc = re.search(r"calls=%?([\w.\-]+)", line)
            kind = comp_kind.get(mc.group(1), "elementwise") if mc else "elementwise"
            cat = {"matmul": "matmul_fusion", "conv": "conv_fusion",
                   "rng": "rng_dropout", "elementwise": "loop_fusion"}[kind]
        elif opcode in ("copy", "transpose", "bitcast", "copy-start",
                        "copy-done"):
            cat = "copy_layout"
        elif opcode in ("convolution",):
            cat = "conv_fusion"
        elif opcode in ("dot",):
            cat = "matmul_fusion"
        elif opcode.startswith(("all-", "collective", "reduce-scatter")):
            cat = "collective"
        elif opcode == "rng-bit-generator":
            cat = "rng_dropout"
        else:
            cat = "other:" + opcode
        out[name] = (cat, src)
    return out


def categorize(name: str, hlo_map: dict) -> str:
    if name in hlo_map:
        return hlo_map[name][0]
    n = name.lower()
    if "conv" in n:
        return "conv_fusion"
    if any(k in n for k in ("dot", "matmul", "einsum", "gemm")):
        return "matmul_fusion"
    if any(k in n for k in ("rng", "bit-generator", "threefry", "philox",
                            "rbg")):
        return "rng_dropout"
    if any(k in n for k in ("copy", "transpose", "bitcast")):
        return "copy_layout"
    if "fusion" in n or "loop" in n:
        return "loop_fusion"
    if any(k in n for k in ("all-reduce", "all-gather", "reduce-scatter",
                            "collective")):
        return "collective"
    return "other"


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("EMM_JAX_CACHE", "/tmp/emm_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench

    # PROFILE_MODE: vlmo_pretrain (default) | beit_mim | bert_mlm — same
    # configs as the matching bench.py modes, so profiles and BENCHMARKS.json
    # rows describe the same program
    mode = os.environ.get("PROFILE_MODE", "vlmo_pretrain")
    batch_size = int(os.environ.get(
        "BENCH_BATCH", str(bench.DEFAULT_BATCH.get(mode, 32))
    ))

    if mode == "bert_mlm":
        import numpy as np

        from exploremultimodal_tpu.config import load_config
        from exploremultimodal_tpu.models import build_model
        from exploremultimodal_tpu.models.task import VlmoTask

        cfg = load_config(
            ["model=vlmo_base", "train=pretrain_txt",
             "model.max_text_len=196", "compute_dtype=bfloat16",
             "model.drop_rate=0.0", "model.attn_drop_rate=0.0",
             "model.drop_path_rate=0.0",
             f"model.quantize={os.environ.get('BENCH_QUANTIZE', 'none')}"]
        )
        task = build_model(cfg)
        rng = np.random.default_rng(0)
        L = 196
        fwd_batch = {
            "text_ids": jnp.asarray(rng.integers(0, 30522, (batch_size, L))),
            "text_ids_mlm": jnp.asarray(
                rng.integers(0, 30522, (batch_size, L))),
            "text_labels_mlm": jnp.asarray(
                np.where(rng.random((batch_size, L)) < 0.15,
                         rng.integers(0, 30522, (batch_size, L)), -100)),
            "text_mask": jnp.ones((batch_size, L), jnp.int32),
        }
        variables = task.init(
            {"params": jax.random.key(0), "sample": jax.random.key(1)},
            fwd_batch, method=VlmoTask.init_streams,
        )
        fwd_batch["image"] = None

        @jax.jit
        def fwd(params):
            out = task.apply({"params": params}, fwd_batch,
                             rngs={"sample": jax.random.key(2)})
            return out["mlm_task_loss"]

        params = variables["params"]

        def run_once():
            return fwd(params)

        lowered = fwd.lower(params)
    else:
        overrides = {
            "vlmo_pretrain": ["train=pretrain_mum", "exp_dir=/tmp/emm_profile"],
            "beit_mim": ["train=pretrain_vis", "exp_dir=/tmp/emm_profile_mim"],
        }[mode]
        trainer, state, batch = bench._trainer([
            f"model={os.environ.get('BENCH_MODEL', 'vlmo_base')}",
            *overrides,
            "train.datasets=[synthetic]",
            f"data.batch_size={batch_size}",
            f"data.synthetic_size={4 * batch_size}",
            "data.num_workers=4",
            "train.discrete_vae_type=random",
            "compute_dtype=bfloat16",
            f"model.attn_drop_rate={os.environ.get('BENCH_ATTN_DROP', '0.0')}",
            f"attn_impl={os.environ.get('BENCH_ATTN', 'recompute')}",
            f"parallel.remat={os.environ.get('BENCH_REMAT', 'false')}",
            "train.warmup_steps=2",
            "log_level=error",
        ])
        train_step = trainer.make_train_step()
        epoch = jnp.asarray(0.0)
        holder = {"state": state}

        def run_once():
            holder["state"], metrics = train_step(holder["state"], batch, epoch)
            return metrics["total_loss"]

        lowered = train_step.lower(state, batch, epoch)

    # warm up / compile
    for _ in range(3):
        out = run_once()
    bench._sync(out)

    # HLO map: op/fusion instruction name -> (kind, op_name source hint)
    compiled = lowered.compile()
    hlo_text = compiled.as_text()
    with open("/tmp/emm_step_hlo.txt", "w") as f:
        f.write(hlo_text)
    hlo_map = build_hlo_map(hlo_text)

    os.makedirs(TRACE_DIR, exist_ok=True)
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(5):
            out = run_once()
        bench._sync(out)

    # newest trace.json.gz under TRACE_DIR
    traces = sorted(glob.glob(
        os.path.join(TRACE_DIR, "**", "*.trace.json.gz"), recursive=True
    ), key=os.path.getmtime)
    if not traces:
        print("no trace captured (tunneled backend may not support xprof)")
        return
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)

    # keep only events that are HLO instructions of the train step — this
    # selects the TensorCore lane and drops host-python / envelope lanes
    dev_events = [e for e in data.get("traceEvents", [])
                  if e.get("ph") == "X" and e.get("dur")
                  and str(e.get("name", "")) in hlo_map]
    if not dev_events:
        print("no HLO op events in trace")
        return

    per_op = collections.Counter()
    for e in dev_events:
        per_op[e["name"]] += e["dur"]
    n_steps = 5
    total = sum(per_op.values()) / 1e3 / n_steps

    print(f"\n== trace {os.path.basename(traces[-1])}  "
          f"device total {total:.1f} ms/step over {n_steps} steps ==")
    with open("/tmp/emm_per_op.json", "w") as f:
        json.dump({k: {"us_total": v,
                       "cat": hlo_map.get(k, ("?", ""))[0],
                       "src": hlo_map.get(k, ("?", ""))[1]}
                   for k, v in per_op.items()}, f)
    cats = collections.Counter()
    for name, dur in per_op.items():
        cats[categorize(name, hlo_map)] += dur
    print("\n-- categories (ms/step) --")
    for cat, dur in cats.most_common():
        print(f"  {cat:24s} {dur / 1e3 / n_steps:8.2f}")
    print("\n-- top 40 ops (ms/step) --")
    for name, dur in per_op.most_common(40):
        cat, src = hlo_map.get(name, ("?", ""))
        # keep the informative tail of the op_name path
        src_tail = "/".join(src.split("/")[-4:]) if src else ""
        print(f"  {dur / 1e3 / n_steps:8.2f}  {cat:14s} {name[:40]:40s} "
              f"{src_tail[:90]}")


if __name__ == "__main__":
    main()
