"""Aggregate a jax profiler chrome-trace by op family using EXCLUSIVE device
time (nested event durations subtracted from their parents), so wrappers
(cond/while/jit) don't double-count their children.

Usage: python scripts/parse_trace_excl.py [trace_dir]
"""
import collections
import glob
import gzip
import json
import re
import sys

pattern = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jtrace_fwd"
f = sorted(glob.glob(f"{pattern}/plugins/profile/*/*.trace.json.gz"))[-1]
with gzip.open(f) as fh:
    t = json.load(fh)
pids = {e["pid"]: e["args"].get("name", "")
        for e in t["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"}
dev_pids = [p for p, n in pids.items() if "TPU" in n]

# simpler correct algorithm: recompute with explicit parent linkage
agg = collections.defaultdict(lambda: [0, 0.0])
for dev_pid in dev_pids:
    by_tid = collections.defaultdict(list)
    for e in t["traceEvents"]:
        if e.get("ph") == "X" and e.get("pid") == dev_pid and "dur" in e:
            by_tid[e.get("tid", 0)].append(e)
    for tid, evs in by_tid.items():
        evs.sort(key=lambda e: (e["ts"], -e["dur"]))
        stack = []  # [end_ts, family, child_dur]
        for e in evs:
            ts, dur, name = e["ts"], e["dur"], re.sub(r"[.\d]+$", "", e["name"])
            while stack and stack[-1][0] <= ts + 1e-9:
                fin = stack.pop()
                excl = fin[3] - fin[2]
                agg[fin[1]][0] += 1
                agg[fin[1]][1] += excl / 1e3
            if stack:
                stack[-1][2] += dur
            stack.append([ts + dur, name, 0.0, dur])
        while stack:
            fin = stack.pop()
            agg[fin[1]][0] += 1
            agg[fin[1]][1] += (fin[3] - fin[2]) / 1e3

print("== exclusive time by family ==")
tot = sum(d for _, d in agg.values())
for name, (cnt, dur) in sorted(agg.items(), key=lambda kv: -kv[1][1])[:22]:
    print(f"{dur:9.2f} ms ({100*dur/max(tot,1e-9):4.1f}%)  x{cnt:5d}  {name[:64]}")
print(f"{tot:9.2f} ms total exclusive")
