"""Map the compiled train step's fusion names to their source metadata.

The perfetto trace (tools/profile_step.py) reports device time per fusion
name (fusion.15, fusion.30, ...) but not what they compute. This tool
compiles the same bench workload (warm .jax_cache), dumps the optimized
HLO, and prints each named fusion's shape, op mix, and source locations so
trace lines can be attributed to framework stages.

Usage: python tools/hlo_fusions.py [--names fusion.15,fusion.30] [--top 40]
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", default="")
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--out", default="/tmp/step_hlo.txt")
    args = ap.parse_args()

    from tools.profile_step import build_step
    import jax

    step_fn, params, opt_state, batch, key = build_step()
    import jax.numpy as jnp
    lrf = jnp.asarray(1.0)
    # lower the jitted step directly (re-wrapping in jax.jit would hash a
    # different module and miss the persistent compile cache)
    fn = step_fn if hasattr(step_fn, "lower") else jax.jit(step_fn)
    lowered = fn.lower(params, opt_state, batch, key, lrf)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {args.out}")

    # index fusion computations: "%fused_computation.N" bodies and the
    # fusion instructions that call them
    want = set(n.strip() for n in args.names.split(",") if n.strip())
    # fusion instruction lines look like:
    #   %fusion.15 = f32[...] fusion(...), kind=kLoop, calls=%fused_computation.N, metadata={op_name="..." source_file="..." source_line=...}
    fus_re = re.compile(
        r"%(fusion(?:\.\d+)?)\s*=\s*(\S+)\s+fusion\(.*?calls=%?([\w.\-]+)"
        r".*?metadata=\{([^}]*)\}", re.S)
    comp_bodies = {}
    cur = None
    for line in txt.splitlines():
        m = re.match(r"%?([\w.\-]+)\s*\(", line.strip())
        if line.startswith("%fused_computation") or \
                line.strip().startswith("fused_computation"):
            name = line.split()[0].lstrip("%").split("(")[0].strip()
            cur = name
            comp_bodies[cur] = []
        elif cur is not None:
            if line.startswith("}"):
                cur = None
            else:
                comp_bodies.setdefault(cur, []).append(line)

    found = 0
    for m in fus_re.finditer(txt):
        name, shape, callee, meta = m.groups()
        if want and name not in want:
            continue
        found += 1
        print(f"\n=== {name} -> {shape} (calls {callee}) ===")
        src = re.findall(r'op_name="([^"]*)"', meta)
        print("  op_name:", src[0][:180] if src else "?")
        body = comp_bodies.get(callee, [])
        ops = Counter()
        srcs = Counter()
        for line in body:
            mm = re.search(r"=\s*\S+\s+([a-z\-]+)\(", line)
            if mm:
                ops[mm.group(1)] += 1
            sm = re.search(r'source_file="([^"]+)" source_line=(\d+)', line)
            if sm:
                srcs[f"{os.path.basename(sm.group(1))}:{sm.group(2)}"] += 1
        print("  ops:", dict(ops.most_common(12)))
        print("  sources:", dict(srcs.most_common(12)))
    print(f"\nmatched {found} fusion instructions")


if __name__ == "__main__":
    main()
