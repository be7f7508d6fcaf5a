"""Aggregate a jax profiler chrome-trace by op family (device pid)."""
import collections
import glob
import gzip
import json
import re
import sys

pattern = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jtrace2"
f = sorted(glob.glob(f"{pattern}/plugins/profile/*/*.trace.json.gz"))[-1]
with gzip.open(f) as fh:
    t = json.load(fh)
pids = {e["pid"]: e["args"].get("name", "")
        for e in t["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"}
dev_pid = next(p for p, n in pids.items() if "TPU" in n)
ev = [e for e in t["traceEvents"]
      if e.get("ph") == "X" and e.get("pid") == dev_pid and "dur" in e]
agg = collections.defaultdict(lambda: [0, 0.0])
for e in ev:
    name = re.sub(r"[.\d]+$", "", e["name"])
    agg[name][0] += 1
    agg[name][1] += e["dur"] / 1e3
print("== by family ==")
for name, (cnt, dur) in sorted(agg.items(), key=lambda kv: -kv[1][1])[:16]:
    print(f"{dur:9.2f} ms  x{cnt:4d}  {name[:70]}")
print("== top individual ==")
for e in sorted(ev, key=lambda e: -e["dur"])[:14]:
    print(f"{e['dur']/1e3:9.2f} ms  {e['name'][:70]}")
