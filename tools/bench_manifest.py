"""Manifest file-stats evidence: watermark + time-bounded read cost
at warehouse scale.

Builds a perp-kline warehouse table from the flagship generator
(1-minute bars, dt-partitioned — N days × N symbols), then measures:

1. ``latest_timestamp`` — manifest fast path (zero Spark jobs) vs
   the scan fallback (forced by stripping one file's stats entry);
2. ``read_between`` a one-hour window (the hourly incremental tick's
   actual read shape) vs the unpruned ``read().filter`` plan, plus
   the file counts each one touches.

Usage: python tools/bench_manifest.py [--days 90] [--symbols 50]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from datetime import timedelta

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from binancedatapipeline_spark import catalog  # noqa: E402
from binancedatapipeline_spark.session import get_session  # noqa: E402
from binancedatapipeline_spark.warehouse import Warehouse  # noqa: E402
from tools.bench_flagship import gen_klines  # noqa: E402


def best_of(n, fn):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--days", type=int, default=90)
    ap.add_argument("--symbols", type=int, default=50)
    ap.add_argument("--out", default="/tmp/bench_manifest")
    args = ap.parse_args()

    spark = get_session(app_name="bench_manifest")
    shutil.rmtree(args.out, ignore_errors=True)
    src_path = f"{args.out}/src"
    gen_klines(spark, args.symbols, args.days, "PERPETUAL", src_path)
    src = spark.read.parquet(src_path).drop("dt")
    for c in ("open", "high", "low", "volume", "quote_volume",
              "taker_buy_volume", "taker_buy_quote_volume"):
        src = src.withColumn(c, F.col("close"))
    src = src.withColumn("trades_count", F.lit(1))

    wh = Warehouse(spark, f"{args.out}/wh")
    spec = catalog.BN_PERP_KLINES
    t0 = time.perf_counter()
    wh.overwrite(spec, src)
    t_write = time.perf_counter() - t0
    n_rows = args.symbols * args.days * 24 * 60

    manifest = wh._load_manifest(spec.name)
    n_files = sum(len(v) for v in manifest["files"].values())

    # 1. watermark: manifest fast path vs forced scan
    t_wm_fast = best_of(3, lambda: wh.latest_timestamp(spec))
    wm = wh.latest_timestamp(spec)
    stripped = json.loads(json.dumps(manifest))
    first_rel = next(iter(stripped["files"].values()))[0]
    del stripped["stats"][first_rel]
    wh._write_json_atomic(wh._manifest_path(spec.name), stripped)
    t_wm_scan = best_of(3, lambda: wh.latest_timestamp(spec))
    wm_scan = wh.latest_timestamp(spec)
    assert wm == wm_scan, (wm, wm_scan)
    wh._write_json_atomic(wh._manifest_path(spec.name), manifest)

    # 2. one-hour incremental window (the hourly tick's read shape)
    since, until = wm - timedelta(hours=1), wm
    pruned = wh.read_between(spec, since=since, until=until)
    n_pruned_files = len(pruned.inputFiles())
    t_pruned = best_of(3, lambda: pruned.agg(F.sum("close")).collect())
    full = wh.read(spec).filter(F.col("timestamp").between(since, until))
    n_full_files = len(full.inputFiles())
    t_full = best_of(3, lambda: full.agg(F.sum("close")).collect())
    a = pruned.agg(F.sum("close")).first()[0]
    b = full.agg(F.sum("close")).first()[0]
    assert abs(a - b) < 1e-6 * max(abs(a), 1.0), (a, b)

    print(json.dumps({
        "rows": n_rows, "files": n_files, "write_sec": round(t_write, 2),
        "watermark_manifest_sec": round(t_wm_fast, 4),
        "watermark_scan_sec": round(t_wm_scan, 4),
        "hour_window_pruned_files": n_pruned_files,
        "hour_window_all_files": n_full_files,
        "hour_window_pruned_sec": round(t_pruned, 3),
        "hour_window_full_sec": round(t_full, 3),
    }))
    shutil.rmtree(args.out, ignore_errors=True)


if __name__ == "__main__":
    main()
