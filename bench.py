"""Benchmark harness: times every __spark_entry__ query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "total_query_sec", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1}

Each query is forced end-to-end with the noop writer (full execution,
no driver-side collect overhead).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from binancedatapipeline_spark.session import get_session


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0
    spark = get_session(app_name="bench")

    # Warm-up: run each query once at the MEASURED scale factor so
    # JVM/codegen compilation isn't charged to the timed runs (AQE
    # picks different physical plans per scale, so warming at a tiny
    # SF leaves the real plans cold; standard JIT exclusion; disable
    # with SPARK_GRAFT_WARMUP=0).
    do_warmup = os.environ.get("SPARK_GRAFT_WARMUP", "1") != "0"
    if do_warmup:
        for name, fn in entry_mod.queries().items():
            try:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            except Exception:
                pass

    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))
    timings: dict[str, float] = {}
    for name, fn in entry_mod.queries().items():
        best = float("inf")
        for _ in range(max(repeats, 1)):
            # drop any persisted intermediates (e.g. the ngram shingle
            # relation) so every timed run pays its own materialization
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(json.dumps({
        "metric": "total_query_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
