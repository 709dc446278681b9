"""Join a jax.profiler trace's device ops with the step HLO's source lines.

tools/profile_step.py prints the top device ops; this tool prints ALL of
them, each annotated with the fusion's source_file:line metadata from the
optimized HLO dump (tools/hlo_fusions.py writes /tmp/step_hlo.txt), then
aggregates per source line — the view that exposes the long tail of ~1 ms
fusions individually too small for the top-op table.

Usage:
  python tools/profile_step.py --steps 5            # writes the trace
  python tools/hlo_fusions.py                       # writes /tmp/step_hlo.txt
  python tools/trace_attrib.py [--trace /tmp/vhap_trace] [--hlo /tmp/step_hlo.txt]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
from collections import Counter, defaultdict


def load_trace(trace_dir: str):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    by_name = defaultdict(float)
    device_pids = set()
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            name = ev.get("args", {}).get("name", "")
            if "TPU" in name or "/device:" in name or "XLA" in name:
                device_pids.add(ev["pid"])
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "X" and ev.get("pid") in device_pids:
            by_name[ev.get("name", "?")] += ev.get("dur", 0.0)
    return by_name


def hlo_sources(hlo_path: str):
    """instruction name -> (shape, {source_file:line: count}) from the
    optimized HLO text. Walks fusion bodies to collect their ops' metadata."""
    txt = open(hlo_path).read()
    # collect per-computation source counters
    comp_src = defaultdict(Counter)
    cur = None
    src_re = re.compile(r'source_file="([^"]+)"[^}]*source_line=(\d+)')
    for line in txt.splitlines():
        s = line.strip()
        m = re.match(r"%?([\w.\-]+)\s*\([^)]*\)\s*->", s)
        if m and not s.startswith("ROOT"):
            cur = m.group(1)
        for sm in src_re.finditer(line):
            f = os.path.basename(sm.group(1))
            comp_src[cur][f"{f}:{sm.group(2)}"] += 1
    # instructions at ENTRY scope: name = shape op(...), calls=..., metadata
    inst = {}
    inst_re = re.compile(
        r"%?([\w.\-]+)\s*=\s*(\S+)\s+(\w[\w\-]*)\((.*)$")
    for line in txt.splitlines():
        s = line.strip()
        m = inst_re.match(s)
        if not m:
            continue
        name, shape, op = m.group(1), m.group(2), m.group(3)
        srcs = Counter()
        cm = re.search(r"calls=%?([\w.\-]+)", s)
        if cm and cm.group(1) in comp_src:
            srcs += comp_src[cm.group(1)]
        for sm in src_re.finditer(s):
            f = os.path.basename(sm.group(1))
            srcs[f"{f}:{sm.group(2)}"] += 1
        om = re.search(r'op_name="([^"]+)"', s)
        inst[name] = (shape[:40], op, srcs.most_common(2),
                      om.group(1)[-60:] if om else "")
    return inst


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default="/tmp/vhap_trace")
    ap.add_argument("--hlo", default="/tmp/step_hlo.txt")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--min_us", type=float, default=50.0)
    args = ap.parse_args()

    by_name = load_trace(args.trace)
    inst = hlo_sources(args.hlo)

    per_src = Counter()
    rows = []
    for name, dur in by_name.items():
        us = dur / args.steps
        meta = inst.get(name) or inst.get(name.split("(")[0])
        if meta:
            shape, op, srcs, op_name = meta
            key = srcs[0][0] if srcs else (op_name or op)
        else:
            shape, op, srcs, op_name = "", "?", [], ""
            key = name if not name[:1].isdigit() else "(step span)"
        per_src[key] += us
        rows.append((us, name, shape, srcs, op_name))

    rows.sort(reverse=True)
    print("== per-op (us/step) ==")
    for us, name, shape, srcs, op_name in rows:
        if us < args.min_us:
            continue
        print(f"{us:9.0f}  {name[:28]:28s} {shape:40s} "
              f"{srcs} {op_name[:50]}")
    print("\n== aggregated by source line (us/step) ==")
    for key, us in per_src.most_common(60):
        print(f"{us:9.0f}  {key}")


if __name__ == "__main__":
    main()
