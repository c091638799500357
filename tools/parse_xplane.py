"""Aggregate a jax.profiler TPU trace into a per-stage bottleneck table.

Reads the xplane.pb written under <trace_dir>/plugins/profile/<run>/ by
`jax.profiler.start_trace` (bench.py env BENCH_TRACE_DIR, or the engine's
profile_dir option), sums device-op durations, and attributes them to
kernel stages via the HLO op metadata (JAX records the originating Python
scope/line in each op's name/stat strings).

Usage: python tools/parse_xplane.py /tmp/trace [--top 30]
Prints per-stage totals then the top individual ops.
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys


def load_xspace(trace_dir: str):
    # late import: tensorflow is heavy and only needed for this tool
    from tensorflow.core.profiler.protobuf import xplane_pb2

    pats = [
        os.path.join(trace_dir, "**", "*.xplane.pb"),
        os.path.join(trace_dir, "*.xplane.pb"),
    ]
    files = [f for p in pats for f in glob.glob(p, recursive=True)]
    if not files:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(sorted(files)[-1], "rb") as f:
        xs.ParseFromString(f.read())
    return xs


# stage buckets keyed by substrings of the op's scope/source metadata
STAGES = [
    ("rebin/sort", re.compile(r"rebin|sort", re.I)),
    ("substep ΔE + accept", re.compile(r"submove|color_substep|pair_potential|_select_row|round_body|scan", re.I)),
    ("halo writeback", re.compile(r"_write_back|pad|dynamic_update", re.I)),
    ("RNG bulk draws", re.compile(r"random|threefry|rng", re.I)),
    ("unbin/scatter", re.compile(r"unbin|scatter", re.I)),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    xs = load_xspace(args.trace_dir)
    dev_planes = [p for p in xs.planes if "TPU" in p.name or "/device" in p.name]
    if not dev_planes:
        print("planes found:", [p.name for p in xs.planes], file=sys.stderr)
        raise SystemExit("no device plane in trace")

    op_tot = collections.Counter()  # name -> ps
    for plane in dev_planes:
        ev_meta = plane.event_metadata
        stat_meta = plane.stat_metadata
        for line in plane.lines:
            for ev in line.events:
                md = ev_meta[ev.metadata_id]
                name = md.display_name or md.name
                # prefer the JAX source scope stat when present
                scope = None
                for st in ev.stats:
                    sname = stat_meta[st.metadata_id].name
                    if sname in ("tf_op", "hlo_op", "name", "tf_op_name"):
                        # the xplane oneof stores by-reference strings in
                        # ref_value (an index into stat_metadata); guard the
                        # lookup with `in` — map access inserts default entries
                        v = st.str_value
                        if not v and st.ref_value in stat_meta:
                            v = stat_meta[st.ref_value].name
                        if v:
                            scope = v
                for st in ev.stats:
                    if stat_meta[st.metadata_id].name == "long_name" and st.str_value:
                        scope = st.str_value
                key = f"{name} | {scope}" if scope and scope != name else name
                op_tot[key] += ev.duration_ps

    total = sum(op_tot.values())
    if not total:
        raise SystemExit("trace has no device events")

    stage_tot = collections.Counter()
    for key, ps in op_tot.items():
        for stage, pat in STAGES:
            if pat.search(key):
                stage_tot[stage] += ps
                break
        else:
            stage_tot["other"] += ps

    print(f"device total: {total/1e12:.4f} s over {len(op_tot)} distinct ops")
    print("\n== stage buckets ==")
    for stage, ps in stage_tot.most_common():
        print(f"{ps/total*100:6.2f}%  {ps/1e12:8.4f}s  {stage}")
    print(f"\n== top {args.top} ops ==")
    for key, ps in op_tot.most_common(args.top):
        print(f"{ps/total*100:6.2f}%  {ps/1e9:9.3f}ms  {key[:140]}")


if __name__ == "__main__":
    main()
