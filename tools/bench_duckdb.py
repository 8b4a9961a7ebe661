#!/usr/bin/env python3
"""DuckDB side of the BASELINE protocol: run every oracle SQL against a
scale dir, 1 warm-up + median of 3, print one JSON line.
Usage: bench_duckdb.py <verify_out_with_oracle_sql.json> <sf_dir>
"""
import json
import os
import statistics
import sys
import time

import duckdb

out_dir, sf_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
results = {}
for name in sorted(oracle):
    sql = oracle[name]
    try:
        con.execute(sql).fetchall()  # warm-up
        times = []
        for _ in range(3):
            t0 = time.monotonic()
            con.execute(sql).fetchall()
            times.append(time.monotonic() - t0)
        results[name] = round(statistics.median(times), 4)
    except Exception as exc:  # noqa: BLE001
        print(f"ERR {name}: {exc}", file=sys.stderr)
        results[name] = -1.0

total = round(sum(v for v in results.values() if v >= 0), 4)
print(json.dumps({"metric": "duckdb_total", "value": total, "unit": "sec",
                  "queries": results, "sf": sf_dir}))
