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

A DuckDB comparator runs the SAME full premium+WMA recompute and
extreme-cases detector over the SAME parquet files (single node,
all cores — DuckDB's home turf). The ≤2× contract is structurally
unreachable at sf0.1 where Spark's fixed per-query overhead dwarfs
10ms queries; THIS is the scale where plans dominate and the
comparison is meaningful.

Emits one JSON line:
  {"rows_per_table": {...}, "full_sec": {...}, "incr_sec": {...},
   "extreme_sec": N, "incr_flat_ratio": N,
   "duck_full_sec": {...}, "duck_extreme_sec": N}

Usage: python tools/bench_flagship.py [--days 30,90,270]
       [--symbols 50] [--out /tmp/flagship] [--no-duckdb]
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


def _duck_premium_sql(warmup: str, start: str, end: str) -> str:
    """DuckDB rendering of premium_wma (same join + running-sums WMA
    identity as operators/wma.py; semantics cross-checked by the
    oracle suite at sf0.01)."""
    return f"""
WITH joined AS (
  SELECT p.symbol AS symbol, p.exchange AS exchange,
         p."timestamp" AS ts, p.close_time AS close_time,
         p.close / s.close - 1 AS premium
  FROM perp p JOIN spot s
    ON p.symbol = s.symbol AND p."timestamp" = s."timestamp"
  WHERE p."timestamp" >= TIMESTAMP '{warmup}'
    AND p."timestamp" <= TIMESTAMP '{end}'
), base AS (
  SELECT *, row_number() OVER (PARTITION BY symbol ORDER BY ts) AS rn
  FROM joined
), wma AS (
  SELECT symbol, exchange, ts, close_time, premium,
         CASE WHEN count(premium) OVER w = 120 THEN
           (sum(premium * rn) OVER w - (rn - 120) * sum(premium) OVER w)
             / 7260.0
         END AS wma120_premium
  FROM base
  WINDOW w AS (PARTITION BY symbol ORDER BY ts
               ROWS BETWEEN 119 PRECEDING AND CURRENT ROW)
)
SELECT * FROM wma
WHERE ts >= TIMESTAMP '{start}' AND ts <= TIMESTAMP '{end}'
"""


def _duck_full(con, warmup: str, start: str, end: str) -> float:
    """Force full evaluation of every row + every WMA window (the
    aggregate sinks mirror Spark's noop write: all work, no output)."""
    q = (
        "SELECT count(*), sum(premium), sum(wma120_premium) FROM ("
        + _duck_premium_sql(warmup, start, end)
        + ")"
    )
    t0 = time.perf_counter()
    con.execute(q).fetchall()
    return time.perf_counter() - t0


def _duck_extreme(con, n_symbols: int, warmup: str, start: str, end: str) -> float:
    q = f"""
WITH prem AS ({_duck_premium_sql(warmup, start, end)}),
syms AS (
  SELECT 'SYM' || lpad(CAST(i AS VARCHAR), 4, '0') AS symbol,
         TIMESTAMP '{T0}' - INTERVAL 400 DAY AS onboard_date
  FROM range({n_symbols}) t(i)
),
prepared AS (
  SELECT p.symbol, p.ts AS fundingTime, p.wma120_premium AS fundingRate
  FROM prem p JOIN syms s
    ON p.symbol = s.symbol AND p.ts > s.onboard_date + INTERVAL 5 DAY
),
lagged AS (
  SELECT symbol, fundingTime,
         lag(fundingTime, 30) OVER w AS prev_fundingTime,
         fundingRate,
         lag(fundingRate, 30) OVER w AS prev_fundingRate
  FROM prepared WINDOW w AS (PARTITION BY symbol ORDER BY fundingTime)
),
change AS (
  SELECT *, fundingRate - prev_fundingRate AS fundingRate_change
  FROM lagged WHERE fundingRate - prev_fundingRate < -0.006
),
spaced AS (
  SELECT *, (epoch_ms(fundingTime) - epoch_ms(
      lag(fundingTime, 1) OVER (PARTITION BY symbol ORDER BY fundingTime)
    )) / 60000.0 AS fundingTime_diff
  FROM change
)
SELECT * FROM spaced
WHERE fundingTime_diff IS NULL OR fundingTime_diff > 1440
ORDER BY fundingTime DESC, symbol LIMIT 10
"""
    t0 = time.perf_counter()
    con.execute(q).fetchall()
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--days", default="30,90,270")
    ap.add_argument("--symbols", type=int, default=50)
    ap.add_argument("--out", default="/tmp/flagship")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--no-duckdb", action="store_true")
    args = ap.parse_args()
    day_list = [int(d) for d in args.days.split(",")]

    spark = get_session(app_name="bench_flagship")
    rows_per_table: dict[str, int] = {}
    full_sec: dict[str, float] = {}
    incr_sec: dict[str, float] = {}
    extreme_sec = None
    duck_full_sec: dict[str, float] = {}
    duck_extreme_sec = None
    warmup_str = "2023-12-31 22:00:00"  # T0 - 120 minutes

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

        if not args.no_duckdb:
            import duckdb

            con = duckdb.connect()
            con.execute(
                "CREATE VIEW perp AS SELECT * FROM read_parquet("
                f"'{perp_dir}/*/*.parquet', hive_partitioning=1)"
            )
            con.execute(
                "CREATE VIEW spot AS SELECT * FROM read_parquet("
                f"'{spot_dir}/*/*.parquet', hive_partitioning=1)"
            )
            duck_full_sec[str(days)] = round(
                _duck_full(con, warmup_str, T0, end_str), 2
            )
            if days == max(day_list):
                duck_extreme_sec = round(
                    _duck_extreme(con, args.symbols, warmup_str, T0, end_str), 2
                )
            con.close()

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
    if duck_full_sec:
        out["duck_full_sec"] = duck_full_sec
        out["duck_extreme_sec"] = duck_extreme_sec
        out["spark_vs_duck_full"] = {
            d: round(full_sec[d] / max(duck_full_sec[d], 1e-9), 2)
            for d in duck_full_sec
        }
    print(json.dumps(out))
    if not args.keep:
        shutil.rmtree(args.out, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
