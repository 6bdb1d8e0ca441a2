"""Op-level profile of the bench.py configs (BENCH.md evidence).

Captures a jax.profiler device trace around a few steps of the exact
bench.py configuration selected by BENCH_MODE (vlmo_pretrain default,
beit_mim, vqa) and prints TPU TensorCore time by op kind, by model
component (tf_op provenance), and by source line — the data behind
BENCH.md's "where the remaining per-chip gap is" section.

Usage:  python scripts/profile_headline.py [trace_dir]
Env:    BENCH_MODE / BENCH_ATTN / BENCH_ATTN_DROP / BENCH_BATCH as in
        bench.py; PROFILE_REPORT_ONLY=1 to re-report an existing trace.
"""

from __future__ import annotations

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench harness)


def capture(trace_dir: str) -> None:
    import jax
    import jax.numpy as jnp

    bench._setup_cache()
    batch_size = int(os.environ.get("BENCH_BATCH", "32"))
    mode = os.environ.get("BENCH_MODE", "vlmo_pretrain")
    train_yaml = {"vlmo_pretrain": "pretrain_mum", "beit_mim": "pretrain_vis",
                  "vqa": "finetune_vqa"}[mode]
    trainer, state, batch = bench._trainer(
        [
            "model=vlmo_base",
            f"train={train_yaml}",
            "train.datasets=[synthetic]",
            f"data.batch_size={batch_size}",
            f"data.synthetic_size={4 * batch_size}",
            "data.num_workers=4",
            "train.discrete_vae_type=random",
            "compute_dtype=bfloat16",
            f"model.attn_drop_rate={os.environ.get('BENCH_ATTN_DROP', '0.0')}",
            f"attn_impl={os.environ.get('BENCH_ATTN', 'recompute')}",
            "train.warmup_steps=2",
            "exp_dir=/tmp/emm_profile",
            "log_level=error",
        ]
    )
    train_step = trainer.make_train_step()
    epoch = jnp.asarray(0.0)
    for _ in range(3):  # compile + warm
        state, metrics = train_step(state, batch, epoch)
    bench._sync(metrics["total_loss"])

    jax.profiler.start_trace(trace_dir)
    for _ in range(3):
        state, metrics = train_step(state, batch, epoch)
    bench._sync(metrics["total_loss"])
    jax.profiler.stop_trace()


def report(trace_dir: str, top_n: int = 45) -> None:
    """Aggregate TPU device time per HLO op from the raw xplane proto.

    (tensorboard_plugin_profile's converter is ABI-incompatible with this
    image's TF build, so this parses XSpace directly: every event on the
    device planes' "XLA Ops" lines, keyed by the fusion/op display name.)
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xplanes = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                               recursive=True))
    if not xplanes:
        raise SystemExit(f"no .xplane.pb under {trace_dir}")
    space = xplane_pb2.XSpace()
    with open(xplanes[-1], "rb") as f:  # newest capture
        space.ParseFromString(f.read())

    import re

    per_kind: dict[str, float] = {}
    per_inst: dict[str, float] = {}
    total_ps = 0.0
    n_steps = 0
    for plane in space.planes:
        if "TPU" not in plane.name:
            continue
        meta = plane.event_metadata
        for line in plane.lines:
            if line.name == "Steps":
                n_steps = max(n_steps, len(line.events))
            # 'XLA Ops' is the flat, non-overlapping TensorCore timeline;
            # 'Async XLA Ops' spans overlap compute (DMA windows) — excluded
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = meta[ev.metadata_id].name
                m = re.match(r"%?([a-zA-Z][\w-]*?)[.\s]", name + " ")
                kind = m.group(1).rstrip(".") if m else name[:30]
                per_kind[kind] = per_kind.get(kind, 0.0) + ev.duration_ps
                key = name.split(" = ")[0]
                per_inst[key] = per_inst.get(key, 0.0) + ev.duration_ps
                total_ps += ev.duration_ps
    if not per_kind:
        for plane in space.planes:
            print(plane.name, [l.name for l in plane.lines])
        raise SystemExit("no XLA Ops line found on a device plane")

    denom = max(n_steps, 1)
    print(f"TensorCore op time: {total_ps / 1e9 / denom:.1f} ms/step "
          f"({n_steps} steps)\n")
    print(f"{'op kind':28s} {'ms/step':>9s} {'%':>6s}")
    for kind, ps in sorted(per_kind.items(), key=lambda kv: -kv[1])[:18]:
        print(f"{kind:28s} {ps / 1e9 / denom:9.3f} {100 * ps / total_ps:6.2f}")

    # second pass: aggregate by tf_op provenance (model component)
    per_mod: dict[str, float] = {}
    per_src: dict[str, float] = {}
    for plane in space.planes:
        if plane.name != "/device:TPU:0":
            continue
        meta = plane.event_metadata
        smeta = plane.stat_metadata
        sname = {k: v.name for k, v in smeta.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                md = meta[ev.metadata_id]
                tf_op = src = ""
                for st in md.stats:
                    n = sname.get(st.metadata_id, "")
                    if n == "tf_op":
                        tf_op = st.str_value or (
                            st.ref_value and sname.get(st.ref_value, "")) or ""
                    elif n == "source":
                        src = st.str_value or (
                            st.ref_value and sname.get(st.ref_value, "")) or ""
                # bucket: drop the jit(train_step)/ prefix, keep 3 segments,
                # strip per-layer indices so blocks aggregate
                parts = [re.sub(r"_\d+$", "_*", p)
                         for p in tf_op.strip(":").split("/")[1:4]]
                mod = "/".join(parts) if parts else "(no tf_op)"
                per_mod[mod] = per_mod.get(mod, 0.0) + ev.duration_ps
                per_src[src or "(none)"] = (
                    per_src.get(src or "(none)", 0.0) + ev.duration_ps)
    print(f"\n{'model component (tf_op, depth 3)':58s} {'ms/step':>9s} {'%':>6s}")
    for modname, ps in sorted(per_mod.items(), key=lambda kv: -kv[1])[:28]:
        print(f"{modname[:58]:58s} {ps / 1e9 / denom:9.3f} "
              f"{100 * ps / total_ps:6.2f}")
    print(f"\n{'source line':58s} {'ms/step':>9s} {'%':>6s}")
    for srcname, ps in sorted(per_src.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{srcname[-58:]:58s} {ps / 1e9 / denom:9.3f} "
              f"{100 * ps / total_ps:6.2f}")


if __name__ == "__main__":
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/emm_trace"
    if os.environ.get("PROFILE_REPORT_ONLY", "") != "1":
        capture(trace_dir)
    report(trace_dir)
