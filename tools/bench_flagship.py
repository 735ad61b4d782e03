"""Flagship-scale benchmark: premium_wma + extreme_cases at ~sf1.

The per-round bench (bench.py) runs at sf0.1 where Spark's fixed
per-query overhead dominates; this tool produces the 100×-scale
evidence instead. It generates deterministic 1-minute perp/spot
klines WITH SPARK ITSELF (spark.range + column expressions — no
driver-side pandas, so generation is distributed and O(memory/core)),
then measures the flagship pipeline two ways:

  (a) FULL recompute of premium + WMA-120 (+ the extreme-event
      detector) over the whole history, at increasing history
      lengths — the scaling curve. Linear-in-rows is the pass bar:
      the plan is one equi-join shuffle + one window pass, so wall
      time should track row count, not blow up.
  (b) INCREMENTAL update — the reference's hourly job shape
      (crypto_data_pipeline_duckdb.py:1221-1268): only the last
      day's window plus the 120-minute WMA warm-up, with the scan
      date-partition-pruned the way Warehouse.incremental prunes.
      This must be ~FLAT as history grows — O(window), not
      O(history) — which is the sub-linear-vs-naive story: a naive
      engine recomputes (a) every hour; this pipeline pays (b).

Emits one JSON line:
  {"rows_per_table": {...}, "full_sec": {...}, "incr_sec": {...},
   "extreme_sec": N, "incr_flat_ratio": N}

Usage: python tools/bench_flagship.py [--days 30,90,270]
       [--symbols 50] [--out /tmp/flagship]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binancedatapipeline_spark.plans.extreme import extreme_cases
from binancedatapipeline_spark.plans.premium import premium_wma
from binancedatapipeline_spark.session import get_session

T0 = "2024-01-01 00:00:00"


def gen_klines(
    spark: SparkSession, n_symbols: int, days: int, kind: str, out: str
) -> None:
    """Deterministic 1m bars for n_symbols × days, written as
    dt-partitioned parquet. Prices are hash-free closed-form waves
    (sin of the bar index) so perp/spot agree symbol-by-symbol and
    the premium series has sustained negative squeezes that trip the
    extreme detector — same shape as fixtures.klines, 100× bigger."""
    minutes = days * 24 * 60
    ids = spark.range(0, n_symbols * minutes, 1, 64)
    sym_i = (F.col("id") / minutes).cast("long")
    m = (F.col("id") % minutes).cast("long")
    ts = F.to_timestamp(F.lit(T0)) + (m * F.expr("interval 1 minute"))
    spot_close = 100.0 * (
        1.0
        + 0.05 * F.sin(m / 577.0 + sym_i)
        + 0.02 * F.sin(m / 53.0 + sym_i * 7)
    )
    if kind == "PERPETUAL":
        # premium wave: mostly small, with a sustained -2% squeeze for
        # 3 hours once per ~10 days per symbol
        squeeze = F.when((m / 60 % 240) < 3, F.lit(-0.02)).otherwise(F.lit(0.0))
        eps = 0.001 * F.sin(m / 37.0 + sym_i * 3) + squeeze
        close = spot_close * (1.0 + eps)
    else:
        close = spot_close
    df = ids.select(
        F.concat(F.lit("SYM"), F.lpad(sym_i.cast("string"), 4, "0")).alias("symbol"),
        F.lit("binance").alias("exchange"),
        F.lit(kind).alias("type"),
        F.lit("1m").alias("interval"),
        ts.alias("timestamp"),
        (ts + F.expr("interval 59 seconds")).alias("close_time"),
        close.alias("close"),
        F.to_date(ts).alias("dt"),
    )
    df.write.mode("overwrite").partitionBy("dt").parquet(out)


def gen_perp_symbols(spark: SparkSession, n_symbols: int) -> DataFrame:
    return spark.range(0, n_symbols).select(
        F.concat(F.lit("SYM"), F.lpad(F.col("id").cast("string"), 4, "0")).alias(
            "symbol"
        ),
        (F.to_timestamp(F.lit(T0)) - F.expr("interval 400 days")).alias(
            "onboard_date"
        ),
    )


def _noop(df: DataFrame) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--days", default="30,90,270")
    ap.add_argument("--symbols", type=int, default=50)
    ap.add_argument("--out", default="/tmp/flagship")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()
    day_list = [int(d) for d in args.days.split(",")]

    spark = get_session(app_name="bench_flagship")
    rows_per_table: dict[str, int] = {}
    full_sec: dict[str, float] = {}
    incr_sec: dict[str, float] = {}
    extreme_sec = None

    for days in day_list:
        perp_dir = os.path.join(args.out, f"perp_{days}d")
        spot_dir = os.path.join(args.out, f"spot_{days}d")
        for kind, d in (("PERPETUAL", perp_dir), ("SPOT", spot_dir)):
            if not os.path.exists(d):
                gen_klines(spark, args.symbols, days, kind, d)
        perp = spark.read.parquet(perp_dir)
        spot = spark.read.parquet(spot_dir)
        rows_per_table[str(days)] = args.symbols * days * 24 * 60

        end = f"2024-01-01 00:00:00"
        end_ts = F.to_timestamp(F.lit(T0)) + F.expr(f"interval {days} days")
        end_str = spark.range(1).select(
            F.date_format(end_ts, "yyyy-MM-dd HH:mm:ss")
        ).first()[0]

        # (a) full recompute over the entire history
        full = premium_wma(perp, spot, start_time=T0, end_time=end_str)
        full_sec[str(days)] = round(_noop(full), 2)

        # (b) incremental: last-day window + 120m warm-up, scans
        # date-partition-pruned exactly as Warehouse.incremental would
        inc_start = spark.range(1).select(
            F.date_format(
                end_ts - F.expr("interval 1 day"), "yyyy-MM-dd HH:mm:ss"
            )
        ).first()[0]
        prune_from = spark.range(1).select(
            F.to_date(end_ts - F.expr("interval 1 day") - F.expr("interval 120 minutes"))
        ).first()[0]
        perp_p = perp.filter(F.col("dt") >= F.lit(prune_from))
        spot_p = spot.filter(F.col("dt") >= F.lit(prune_from))
        inc = premium_wma(perp_p, spot_p, start_time=inc_start, end_time=end_str)
        incr_sec[str(days)] = round(_noop(inc), 2)

        if days == max(day_list):
            premium = premium_wma(perp, spot, start_time=T0, end_time=end_str)
            ex = extreme_cases(premium, gen_perp_symbols(spark, args.symbols))
            extreme_sec = round(_noop(ex), 2)

    lo, hi = str(min(day_list)), str(max(day_list))
    out = {
        "symbols": args.symbols,
        "rows_per_table": rows_per_table,
        "full_sec": full_sec,
        "incr_sec": incr_sec,
        "extreme_sec": extreme_sec,
        # incremental cost at the largest history vs the smallest —
        # ~1.0 means O(window), independent of history length
        "incr_flat_ratio": round(incr_sec[hi] / max(incr_sec[lo], 1e-9), 2),
        # full-recompute scaling vs row-count scaling — ~1.0 means linear
        "full_linear_ratio": round(
            (full_sec[hi] / max(full_sec[lo], 1e-9))
            / (rows_per_table[hi] / rows_per_table[lo]),
            2,
        ),
    }
    print(json.dumps(out))
    if not args.keep:
        shutil.rmtree(args.out, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
