"""Aggregate a saved XLA profiler trace dir: device ops by total time,
with copy/fusion/custom-call class subtotals.

Usage: python scripts/trace_agg.py <logdir> [top_n]
"""

import collections
import glob
import gzip
import json
import sys

logdir = sys.argv[1]
top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 60

for path in glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True):
    with gzip.open(path, "rt") as fh:
        data = json.load(fh)
    events = data.get("traceEvents", [])
    pid_names = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    agg = collections.Counter()
    cnt = collections.Counter()
    klass = collections.Counter()
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname:
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0)
        # skip the outer program events (jit_*, while) — we want leaf ops
        if name.startswith(("jit_", "while")):
            continue
        agg[name] += dur
        cnt[name] += 1
        base = name.split(".")[0]
        for tag in ("copy", "fusion", "transpose", "convert", "bitcast",
                    "reduce", "convolution", "custom-call", "dynamic"):
            if tag in base:
                klass[tag] += dur
                break
        else:
            klass[base[:24]] += dur
    total = sum(agg.values())
    print(f"device leaf total: {total/1e3:.1f} ms")
    print("== class subtotals:")
    for k, v in klass.most_common(20):
        print(f"  {v/1e3:9.2f} ms  {k}")
    print(f"== top {top_n} leaf ops:")
    for name, dur in agg.most_common(top_n):
        print(f"  {dur/1e3:9.2f} ms  x{cnt[name]:5d}  {name[:90]}")
