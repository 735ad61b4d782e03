"""Funding-squeeze extreme-event detector.

Reference: ``get_extreme_cases``
(crypto_data_pipeline_duckdb.py:1720-1764 /
crypto_data_pipline_clickhouse.py:1955-1998). Pipeline:

1. bn_premium INNER JOIN bn_perp_symbols ON symbol AND
   p.timestamp > s.onboard_date + INTERVAL 5 DAY (theta join — the
   dim side is small, so Spark broadcasts it and evaluates the
   range conjunct as a residual predicate);
2. LAG(timestamp, k) / LAG(wma120_premium, k) per symbol (offset
   window, k = ``interval`` rows);
3. keep rows where the WMA dropped by more than ``threshold_delta``;
4. debounce: among *surviving* rows, LAG(fundingTime) per symbol
   and keep only events more than ``threshold_diff`` minutes after
   the previous one (the reference's WHERE-on-alias evaluates the
   change filter BEFORE this second window — order preserved here);
5. newest first, top 10, plus an Asia/Shanghai display column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from binancedatapipeline_spark.functions.timeutils import minutes_between, tz_display


def extreme_cases(
    premium: DataFrame,
    perp_symbols: DataFrame,
    interval: int = 30,
    threshold_delta: float = -0.006,
    threshold_diff: int = 1440,
    top_n: int = 10,
    wma_col: str = "wma120_premium",
) -> DataFrame:
    p = premium.alias("p")
    s = perp_symbols.alias("s")
    prepared = (
        p.join(
            F.broadcast(s),
            on=(F.col("p.symbol") == F.col("s.symbol"))
            & (F.col("p.timestamp") > F.col("s.onboard_date") + F.expr("interval 5 days")),
            how="inner",
        )
        .select(
            F.col("p.symbol").alias("symbol"),
            F.col("p.timestamp").alias("fundingTime"),
            F.col(f"p.{wma_col}").alias("fundingRate"),
        )
    )
    w = Window.partitionBy("symbol").orderBy("fundingTime")
    prepared = prepared.select(
        "symbol",
        "fundingTime",
        F.lag("fundingTime", interval).over(w).alias("prev_fundingTime"),
        "fundingRate",
        F.lag("fundingRate", interval).over(w).alias("prev_fundingRate"),
    )
    change = (
        prepared.withColumn(
            "fundingRate_change", F.col("fundingRate") - F.col("prev_fundingRate")
        )
        .filter(F.col("fundingRate_change") < threshold_delta)
    )
    # second window runs over the filtered rows only (debounce spacing
    # between consecutive extreme events, not consecutive bars)
    w2 = Window.partitionBy("symbol").orderBy("fundingTime")
    change = change.withColumn(
        "fundingTime_diff",
        minutes_between(F.lag("fundingTime", 1).over(w2), F.col("fundingTime")),
    )
    events = change.filter(
        F.col("fundingTime_diff").isNull() | (F.col("fundingTime_diff") > threshold_diff)
    )
    out = events.withColumn("fundingTime_cn", tz_display("fundingTime"))
    # symbol tiebreak makes the top-N deterministic (the reference's
    # ORDER BY fundingTime DESC alone is ambiguous across symbols)
    return out.orderBy(F.col("fundingTime").desc(), F.col("symbol")).limit(top_n)
