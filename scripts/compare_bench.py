#!/usr/bin/env python3
"""Bench artifact comparison, two modes.

Legacy pairwise mode (unchanged):
    python3 scripts/compare_bench.py OLD NEW [threshold]
Prints per-query cold ratios above the threshold (default 1.5) + totals.

Triage mode (r15, VERDICT r14 item 3 — makes the round's regression
triage mechanical instead of hand-written prose):
    python3 scripts/compare_bench.py --triage PREV_LOCAL CUR_LOCAL \
        [--driver BENCH_rN.json] [--changed q50_x,q209_y | --changed-file F] \
        [--thr 1.3] [--abs 0.8]
Joins up to three artifacts per gate — previous-round builder run
(cold + warm), current builder run (cold + warm), and the driver's cold
run — and emits a markdown mover table with a mechanical verdict column:

    REAL        warm delta regressed (ratio >= thr AND delta >= abs secs)
                AND the operator is in the changed set
    INVESTIGATE warm delta regressed but the operator is NOT marked
                changed (host drift, shared-materialization attribution,
                or an unmarked change — never silently NOISE)
    NOISE       cold moved but the warm wall did not (cold-JIT /
                scheduling jitter: the r13/r14 finding)
    IMPROVED    warm delta improved by the same thresholds

Gates missing a warm number on either side fall back to cold deltas and
say so. The changed set is a comma list of gate names (or a file with
one name per line), maintained by the round's commit log.
"""
import json, re, sys

def load(p):
    d = json.load(open(p))
    if "queries" in d and d["queries"]:
        return d
    if "tail" in d:
        m = re.search(r'\{"metric".*\}', d["tail"])
        if m:
            return json.loads(m.group(0))
    if "parsed" in d and d["parsed"]:
        return d["parsed"]
    raise SystemExit(f"cannot find queries in {p}")


def triage(argv):
    args = list(argv)
    def opt(name, default=None):
        if name in args:
            i = args.index(name)
            v = args[i + 1]
            del args[i:i + 2]
            return v
        return default
    driver_p = opt("--driver")
    changed = set()
    c = opt("--changed")
    if c:
        changed |= {x.strip() for x in c.split(",") if x.strip()}
    cf = opt("--changed-file")
    if cf:
        changed |= {l.strip() for l in open(cf) if l.strip()}
    thr = float(opt("--thr", "1.3"))
    abse = float(opt("--abs", "0.8"))
    prev, cur = load(args[0]), load(args[1])
    drv = load(driver_p)["queries"] if driver_p else {}
    pw, cw = prev.get("queries_warm", {}), cur.get("queries_warm", {})
    pc, cc = prev["queries"], cur["queries"]
    shared = sorted(set(pc) & set(cc))
    rows = []
    for k in shared:
        have_warm = k in pw and k in cw
        po, no = (pw[k], cw[k]) if have_warm else (pc[k], cc[k])
        delta = no - po
        ratio = no / po if po > 0 else float("inf")
        cold_ratio = cc[k] / pc[k] if pc[k] > 0 else float("inf")
        regressed = ratio >= thr and delta >= abse
        improved = (po / no if no > 0 else float("inf")) >= thr and -delta >= abse
        if regressed:
            verdict = "REAL" if k in changed else "INVESTIGATE"
        elif improved:
            verdict = "IMPROVED"
        elif cold_ratio >= thr and cc[k] - pc[k] >= abse:
            verdict = "NOISE"  # cold moved, warm didn't
        else:
            continue
        if not have_warm:
            verdict += " (cold-only)"
        rows.append((delta, k, pc[k], cc[k],
                     pw.get(k), cw.get(k), drv.get(k), verdict))
    rows.sort(key=lambda r: -abs(r[0]))
    def f(x):
        return f"{x:.2f}" if isinstance(x, float) else "—"
    print("| gate | prev cold | cur cold | prev warm | cur warm | driver cold | warm Δ | verdict |")
    print("|---|---|---|---|---|---|---|---|")
    for delta, k, a, b, w0, w1, d, v in rows:
        print(f"| {k} | {f(a)} | {f(b)} | {f(w0)} | {f(w1)} | {f(d)} | {delta:+.2f} | {v} |")
    tpc = sum(pc[k] for k in shared)
    tcc = sum(cc[k] for k in shared)
    wshared = [k for k in shared if k in pw and k in cw]
    line = (f"\nshared {len(shared)} gates: cold {tpc:.1f}s -> {tcc:.1f}s"
            f" (x{tcc / tpc:.2f})")
    if wshared:
        tw0 = sum(pw[k] for k in wshared)
        tw1 = sum(cw[k] for k in wshared)
        line += (f"; warm ({len(wshared)} gates) {tw0:.1f}s -> {tw1:.1f}s"
                 f" (x{tw1 / tw0:.2f})")
    nreal = sum(1 for r in rows if r[7].startswith("REAL"))
    ninv = sum(1 for r in rows if r[7].startswith("INVESTIGATE"))
    print(line + f"; movers: {len(rows)} ({nreal} REAL, {ninv} INVESTIGATE)")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--triage":
        triage(sys.argv[2:])
        sys.exit(0)
    old, new = load(sys.argv[1])["queries"], load(sys.argv[2])["queries"]
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
