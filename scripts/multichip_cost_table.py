"""Per-preset XLA cost analysis of the vlmo_base training step on a virtual
8-device mesh: FLOPs, bytes accessed, and collective communication volume
(bytes moved by all-reduce / all-gather / reduce-scatter / collective-permute,
parsed from the compiled HLO). COMPILE-ONLY — nothing executes, so vlmo_base
shapes are cheap even on the 1-core CPU VM. Results feed BENCH.md's
"Multi-chip scaling model" table.

Usage (self-provisions the fake 8-device CPU backend):
    python scripts/multichip_cost_table.py [preset ...]
Writes MULTICHIP_COST.json at the repo root and prints a markdown table.
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

N_DEVICES = int(os.environ.get("EMM_COST_DEVICES", "8"))
PRESETS = ["dp", "zero1", "fsdp", "fsdp_offload", "tp"]

DTYPE_BYTES = {
    "f64": 8, "f32": 4, "f16": 2, "bf16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1, "c64": 8, "c128": 16,
}

COLLECTIVE_OPS = (
    "all-reduce", "all-gather", "reduce-scatter", "collective-permute",
    "all-to-all",
)

# `bf16[4,197,768]{2,1,0}` or tuple `(f32[8], bf16[4,16])`
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(shape_str: str) -> int:
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_str):
        if dtype not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dtype]
    return total


def collective_volume(hlo: str) -> dict:
    """Sum output bytes of collective instructions in compiled HLO text.
    all-gather output counts full gathered bytes; all-reduce counts the
    reduced tensor once (ring cost ≈ 2·(n-1)/n·bytes on ICI, noted in
    BENCH.md — this table records the logical tensor volume)."""
    out: dict[str, dict] = {
        op: {"count": 0, "bytes": 0} for op in COLLECTIVE_OPS
    }
    for line in hlo.splitlines():
        stripped = line.strip()
        # `%name = <shape> all-reduce(...)` — also match `all-reduce-start`
        m = re.match(r"%?[\w.\-]+ = (.+?) ([a-z\-]+)(?:-start|-done)?\(",
                     stripped)
        if not m:
            continue
        shape_str, op = m.groups()
        if op in COLLECTIVE_OPS:
            out[op]["count"] += 1
            out[op]["bytes"] += shape_bytes(shape_str)
    out_total = sum(v["bytes"] for v in out.values())
    return {"per_op": {k: v for k, v in out.items() if v["count"]},
            "total_bytes": out_total}


def preset_overrides(preset: str) -> list[str]:
    import __graft_entry__ as ge

    return [f"parallel={preset}", *ge._preset_mesh_overrides(preset, N_DEVICES)]


def analyze(preset: str) -> dict:
    import jax
    import jax.numpy as jnp

    from exploremultimodal_tpu.config import load_config
    from exploremultimodal_tpu.train.trainer import Trainer

    batch_size = N_DEVICES * 4  # 4 images per device at vlmo_base shapes
    cfg = load_config([
        "model=vlmo_base",
        "train=pretrain_mum",
        *preset_overrides(preset),
        "train.datasets=[synthetic]",
        f"data.batch_size={batch_size}",
        f"data.synthetic_size={2 * batch_size}",
        "data.num_workers=0",
        "train.discrete_vae_type=random",
        "compute_dtype=bfloat16",
        "model.attn_drop_rate=0.0",
        "train.warmup_steps=2",
        f"exp_dir=/tmp/emm_cost_{preset}",
        "log_level=error",
    ])
    trainer = Trainer(cfg)
    loader = trainer.data.train_loader()
    batch = next(iter(trainer.feeder(iter(loader))))
    state = trainer.init_state(batch)
    train_step = trainer.make_train_step()
    compiled = train_step.lower(state, batch, jnp.asarray(0.0)).compile()

    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    hlo = compiled.as_text()
    comm = collective_volume(hlo)
    mem = compiled.memory_analysis()
    n_params = sum(
        x.size for x in jax.tree_util.tree_leaves(state.params)
    )
    return {
        "preset": preset,
        "mesh": {k: int(v) for k, v in trainer.mesh.shape.items()},
        "batch_size": batch_size,
        "n_params": int(n_params),
        "flops": float(ca.get("flops", 0.0)),
        "bytes_accessed": float(ca.get("bytes accessed", 0.0)),
        "collectives": comm,
        "argument_size_bytes": getattr(mem, "argument_size_in_bytes", None),
        "output_size_bytes": getattr(mem, "output_size_in_bytes", None),
        "temp_size_bytes": getattr(mem, "temp_size_in_bytes", None),
    }


def main() -> None:
    if not os.environ.get("_EMM_COST_CHILD"):
        # Self-provision the fake 8-device CPU mesh in a subprocess WITHOUT
        # initializing a backend here: probing jax.devices() in the parent
        # would initialize the tunneled TPU plugin, which blocks forever if
        # the tunnel is down — and this analysis is compile-only/CPU by
        # design. Clearing PALLAS_AXON_POOL_IPS skips plugin registration.
        import subprocess

        env = dict(os.environ)
        env["_EMM_COST_CHILD"] = "1"
        env["JAX_PLATFORMS"] = "cpu"
        env["PALLAS_AXON_POOL_IPS"] = ""
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={N_DEVICES}"
        )
        raise SystemExit(subprocess.run(
            [sys.executable, os.path.abspath(__file__), *sys.argv[1:]],
            env=env, cwd=REPO,
        ).returncode)

    import jax

    jax.config.update("jax_platforms", "cpu")
    if len(jax.devices()) < N_DEVICES:
        raise RuntimeError("virtual CPU mesh provisioning failed")

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("EMM_JAX_CACHE", "/tmp/emm_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    presets = sys.argv[1:] or PRESETS
    results = {}
    for preset in presets:
        print(f"analyzing {preset}...", flush=True)
        try:
            results[preset] = analyze(preset)
        except Exception as e:  # record, keep sweeping
            results[preset] = {"preset": preset,
                               "error": f"{type(e).__name__}: {e}"}

    with open(os.path.join(REPO, "MULTICHIP_COST.json"), "w") as f:
        json.dump(results, f, indent=2)

    print("\n| preset | mesh | step TFLOP | bytes GB | collective GB "
          "| AR/AG/RS counts |")
    print("|---|---|---|---|---|---|")
    for preset, r in results.items():
        if "error" in r:
            print(f"| {preset} | ERROR {r['error'][:60]} | | | | |")
            continue
        mesh = "×".join(f"{k}{v}" for k, v in r["mesh"].items() if v > 1)
        per = r["collectives"]["per_op"]
        counts = "/".join(str(per.get(k, {}).get("count", 0))
                          for k in ("all-reduce", "all-gather",
                                    "reduce-scatter"))
        print(f"| {preset} | {mesh} | {r['flops'] / 1e12:.2f} "
              f"| {r['bytes_accessed'] / 1e9:.1f} "
              f"| {r['collectives']['total_bytes'] / 1e9:.3f} "
              f"| {counts} |")


if __name__ == "__main__":
    main()
