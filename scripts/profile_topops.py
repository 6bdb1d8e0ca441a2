"""Dump the top individual XLA instructions (with tf_op/source provenance)
from a jax.profiler trace directory — the drill-down companion to
profile_headline.py's category rollup.

Usage: python scripts/profile_topops.py [/tmp/emm_trace] [filter-substr]
"""

from __future__ import annotations

import glob
import gzip
import os
import re
import sys


def load_space(trace_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True))
    if not files:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    space = xplane_pb2.XSpace()
    with open(files[-1], "rb") as f:
        space.ParseFromString(f.read())
    return space


def main() -> None:
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/emm_trace"
    filt = sys.argv[2] if len(sys.argv) > 2 else ""
    space = load_space(trace_dir)

    rows: dict[str, list] = {}
    total_ps = 0.0
    n_steps = 0
    for plane in space.planes:
        if "TPU" not in plane.name:
            continue
        meta = plane.event_metadata
        smeta = plane.stat_metadata
        sname = {k: v.name for k, v in smeta.items()}
        for line in plane.lines:
            if line.name == "Steps":
                n_steps = max(n_steps, len(line.events))
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                md = meta[ev.metadata_id]
                name = md.name.split(" = ")[0]
                tf_op = src = shape = ""
                for st in md.stats:
                    n = sname.get(st.metadata_id, "")
                    val = st.str_value or (
                        st.ref_value and sname.get(st.ref_value, "")) or ""
                    if n == "tf_op":
                        tf_op = val
                    elif n == "source":
                        src = val
                    elif n in ("shape", "layout"):
                        shape = val
                r = rows.setdefault(name, [0.0, 0, tf_op, src, shape])
                r[0] += ev.duration_ps
                r[1] += 1
                total_ps += ev.duration_ps

    denom = max(n_steps, 1)
    print(f"total {total_ps/1e9/denom:.1f} ms/step over {n_steps} steps; "
          f"top instructions{' matching %r' % filt if filt else ''}:\n")
    shown = 0.0
    for name, (ps, cnt, tf_op, src, shape) in sorted(
            rows.items(), key=lambda kv: -kv[1][0]):
        if filt and filt not in name:
            continue
        shown += ps
        print(f"{ps/1e9/denom:8.3f} ms  x{cnt//denom:<3d} {name[:46]:46s} "
              f"{tf_op[-60:]:60s} {src[-40:]}")
        if shown / total_ps > 0.92 and not filt:
            break


if __name__ == "__main__":
    main()
