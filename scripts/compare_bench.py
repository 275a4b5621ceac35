#!/usr/bin/env python3
"""Compare two bench JSON artifacts (graft.Bench output files or driver
BENCH_r*.json with a `tail` field). Usage:
    python3 scripts/compare_bench.py OLD NEW [threshold]
Prints per-query ratios above the threshold (default 1.5) and the totals.
"""
import json, re, sys

def load(p):
    d = json.load(open(p))
    if "queries" in d:
        return d["queries"]
    if "tail" in d:
        m = re.search(r'\{"metric".*\}', d["tail"])
        if m:
            return json.loads(m.group(0))["queries"]
    if "parsed" in d and d["parsed"]:
        return d["parsed"]["queries"]
    raise SystemExit(f"cannot find queries in {p}")

old, new = load(sys.argv[1]), load(sys.argv[2])
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
shared = sorted(set(old) & set(new))
slow = []
for k in shared:
    if old[k] > 0.2 and new[k] / old[k] >= thr:
        slow.append((new[k] / old[k], k, old[k], new[k]))
for r, k, o, n in sorted(slow, reverse=True):
    print(f"x{r:5.2f}  {k:30s} {o:7.2f}s -> {n:7.2f}s")
to, tn = sum(old[k] for k in shared), sum(new[k] for k in shared)
print(f"\nshared {len(shared)} queries: {to:.1f}s -> {tn:.1f}s "
      f"(x{tn/to:.2f}); {len(slow)} regressions >= x{thr}")
