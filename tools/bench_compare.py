#!/usr/bin/env python3
"""Compare a Spark Bench JSON line with a DuckDB bench JSON line over
their shared query set. Usage: bench_compare.py <spark.json> <duck.json>
Strips an optional leading '[info] ' from either file.
"""
import json
import sys


def load(p):
    line = open(p).read().strip()
    if line.startswith("[info] "):
        line = line[len("[info] "):]
    return json.loads(line)["queries"]


spark, duck = load(sys.argv[1]), load(sys.argv[2])
shared = sorted(set(spark) & set(duck))
ts = sum(spark[q] for q in shared)
td = sum(duck[q] for q in shared)
print(f"shared queries: {len(shared)}  spark {ts:.1f}s  duckdb {td:.1f}s  "
      f"aggregate {ts / td:.2f}x")
wins = [q for q in shared if spark[q] < duck[q]]
print(f"spark wins outright: {len(wins)}: "
      + ", ".join(f"{q} {spark[q] / duck[q]:.2f}x" for q in sorted(
          wins, key=lambda q: spark[q] / duck[q])[:10]))
misses = [(spark[q] / duck[q], q) for q in shared
          if spark[q] / duck[q] > 2 and spark[q] > 1]
print("  >2x with spark >1s:")
for r, q in sorted(misses, reverse=True):
    print(f"  {q}: spark {spark[q]:.2f}s duck {duck[q]:.2f}s = {r:.1f}x")
