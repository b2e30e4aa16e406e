"""Capture an XLA profiler trace of one bench-config STEPS forecast and
print the top device ops by total duration.

Usage: python scripts/trace_bench.py [ablation-name] [top-N]
"""

import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pysteps_tpu.compilation_cache import enable

enable()

import jax.numpy as jnp

import bench
from pysteps_tpu import nowcasts
from pysteps_tpu.utils import profiling

name = sys.argv[1] if len(sys.argv) > 1 else "full"
top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40

from ablate_bench import ABLATIONS  # noqa: E402  (same directory)

_, precip_db, velocity = bench._make_inputs(512)
kwargs = bench._steps_kwargs(96)
kwargs.update(ABLATIONS[name])

f = nowcasts.get_method("steps")
out = f(precip_db, velocity, bench.N_TIMESTEPS, **kwargs)
float(jnp.nanmean(out))
del out

logdir = f"/tmp/pysteps_tpu_trace_{name}"
os.system(f"rm -rf {logdir}")
with profiling.trace(logdir):
    out = f(precip_db, velocity, bench.N_TIMESTEPS, **dict(kwargs, seed=43))
    float(jnp.nanmean(out))

paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
print("trace files:", paths)
for path in paths:
    with gzip.open(path, "rt") as fh:
        data = json.load(fh)
    events = data.get("traceEvents", [])
    # aggregate complete events by name within device tracks
    pid_names = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    agg = collections.Counter()
    cnt = collections.Counter()
    total_by_pid = collections.Counter()
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        key = (pname.split()[0] if pname else "?", e.get("name", "?"))
        dur = e.get("dur", 0)
        agg[key] += dur
        cnt[key] += 1
        total_by_pid[pname] += dur
    print("== totals by process:")
    for pname, dur in total_by_pid.most_common(8):
        print(f"  {pname:50s} {dur/1e3:10.1f} ms")
    print(f"== top {top_n} ops:")
    for (pname, op), dur in agg.most_common(top_n):
        print(f"  {dur/1e3:9.2f} ms  x{cnt[(pname, op)]:5d}  [{pname}] {op[:90]}")
