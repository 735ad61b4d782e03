"""DuckDB comparator for bench.py: times every oracle_sql() query on
the same parquet at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
and writes BASELINE_duckdb.json — the reproducible single-node
baseline the Spark totals are graded against.

Usage: python tools/bench_duckdb.py [--write]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entry_mod

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    oracles = entry_mod.oracle_sql()
    # subset filter, mirroring bench.py's knob (trend probes at large
    # SF run a curated subset; the composite is then not comparable)
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        keep = {s.strip() for s in only.split(",")}
        oracles = {k: v for k, v in oracles.items() if k in keep}
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))
    timings: dict[str, float] = {}
    for name, sql in oracles.items():
        con.execute(sql).fetchall()  # warm-up (page cache, plan)
        best = float("inf")
        for _ in range(max(repeats, 1)):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    from bench import host_calibration

    out = {
        "metric": "duckdb_total_query_sec",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "duckdb_version": duckdb.__version__,
        "n_queries": len(timings),
        # same pinned CPU probe as bench.py: cross-day ratios should
        # divide through by each sample's own host_calibration
        "host_calibration": host_calibration(),
    }
    print(json.dumps(out))
    if "--out" in sys.argv:
        with open(sys.argv[sys.argv.index("--out") + 1], "w") as f:
            json.dump(out, f, indent=1)
    elif "--write" in sys.argv:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(root, "BASELINE_duckdb.json"), "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
