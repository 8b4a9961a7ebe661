#!/usr/bin/env python3
"""Merge Spark best-of-3 and DuckDB median-of-3 bench runs into the
BASELINE.md §4 table (markdown on stdout).

Usage: bench_merge.py <duckdb_sf1.json> <duckdb_sf01.json> \
         <spark_sf1_run1.json> [more sf1 runs...] -- \
         <spark_sf01_run1.json> [more sf0.1 runs...]

Spark per-query value = min over runs (best-of-3, separate JVMs);
DuckDB value = the median-of-3 its runner already reports. The
"marginal" column is Spark(sf1) - Spark(sf0.1) vs DuckDB(sf1) -
DuckDB(sf0.1): the cost of the extra ~5.4M lineitem rows with the
per-query floor subtracted out.
"""
import json
import sys


def load(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
    raise ValueError(f"no JSON line in {path}")


args = sys.argv[1:]
split = args.index("--")
duck1, duck01 = load(args[0]), load(args[1])
spark1_runs = [load(p) for p in args[2:split]]
spark01_runs = [load(p) for p in args[split + 1:]]


def best(runs, name):
    vals = [r["queries"][name] for r in runs
            if name in r["queries"] and r["queries"][name] >= 0]
    return min(vals) if vals else None


names = sorted(spark1_runs[0]["queries"])
rows = []
n_pass = n_gate = 0
for n in names:
    s1 = best(spark1_runs, n)
    s01 = best(spark01_runs, n)
    d1 = duck1["queries"].get(n)
    d01 = duck01["queries"].get(n)
    oracle = d1 is not None and d1 >= 0
    if oracle:
        ratio = s1 / d1 if d1 > 0 else float("inf")
        marg_s = (s1 - s01) if s01 is not None else None
        marg_d = (d1 - d01) if (d01 is not None and d01 >= 0) else None
        gate = "PASS" if ratio <= 2.0 else f"{ratio:.1f}x"
        n_gate += 1
        n_pass += ratio <= 2.0
        rows.append((n, d1, s1, marg_d, marg_s, gate))
    else:
        rows.append((n, None, s1, None,
                     (s1 - s01) if s01 is not None else None, "rows-only"))

print("| query | DuckDB sf1 (s) | Spark sf1 (s) | DuckDB marginal | Spark marginal | gate |")
print("|---|---|---|---|---|---|")
for (n, d1, s1, md, ms, gate) in rows:
    def fmt(v):
        return f"{v:.3f}" if v is not None else "—"
    print(f"| {n} | {fmt(d1)} | {fmt(s1)} | {fmt(md)} | {fmt(ms)} | {gate} |")

duck_total = sum(v for n, v in duck1["queries"].items() if v >= 0)
spark_total = sum(best(spark1_runs, n) for n in names
                  if duck1["queries"].get(n, -1) >= 0)
print()
print(f"DuckDB total (oracled): {duck_total:.2f} s; "
      f"Spark total (same set): {spark_total:.2f} s; "
      f"ratio {spark_total / duck_total:.2f}x; "
      f"absolute gate: {n_pass}/{n_gate} <= 2x")
