#!/usr/bin/env python3
"""Combine N graft.Bench output files (the full per-query JSON line each
run writes to SPARK_GRAFT_BENCH_OUT) into per-query medians, and
optionally a growth table vs a base medians file.

Usage:
  medians.py out.json run1.json run2.json [run3.json ...]
  medians.py --growth base_medians.json scaled_medians.json factor
"""
import sys, json, statistics

if sys.argv[1] == "--growth":
    base = json.load(open(sys.argv[2]))["queries"]
    scaled = json.load(open(sys.argv[3]))["queries"]
    factor = float(sys.argv[4])
    rows = []
    for q in sorted(scaled):
        b, s = base.get(q), scaled[q]
        if b is None or b <= 0 or s <= 0:
            continue
        rows.append((s / b, q, b, s))
    rows.sort(reverse=True)
    print(f"{'query':34s} {'base_s':>8s} {'scaled_s':>9s} {'ratio':>7s}  (data x{factor:g})")
    for r, q, b, s in rows:
        flag = "  <-- SUPER-LINEAR" if r > factor * 1.3 else ""
        print(f"{q:34s} {b:8.3f} {s:9.3f} {r:6.1f}x{flag}")
    tot_b = sum(b for _, _, b, _ in rows)
    tot_s = sum(s for _, _, _, s in rows)
    print(f"{'TOTAL':34s} {tot_b:8.1f} {tot_s:9.1f} {tot_s/tot_b:6.1f}x")
    sys.exit(0)

out, runs = sys.argv[1], [json.load(open(p)) for p in sys.argv[2:]]
queries = {}
for q in runs[0]["queries"]:
    vals = [r["queries"][q] for r in runs if r["queries"].get(q, -1) >= 0]
    queries[q] = round(statistics.median(vals), 3) if vals else -1.0
total = round(sum(v for v in queries.values() if v > 0), 3)
json.dump({"metric": "total_median", "value": total, "unit": "sec",
           "runs": len(runs), "queries": queries,
           "sf": runs[0].get("sf", "?")}, open(out, "w"), indent=1)
print(f"{out}: total {total}s over {len(queries)} queries ({len(runs)} runs)")
