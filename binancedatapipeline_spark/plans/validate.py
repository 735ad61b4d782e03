"""Kline continuity audit (gap detection).

Reference: ``validate_data``
(crypto_data_pipline_clickhouse.py:1920-1953): per symbol, the next
bar's timestamp (LEAD emulated with ``anyLast ... ROWS BETWEEN 1
FOLLOWING AND 1 FOLLOWING``) minus this bar's timestamp, reported
where the spacing exceeds the bar interval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def validate_klines(
    klines: DataFrame,
    interval_hours: int = 1,
    entity_col: str = "symbol",
    time_col: str = "timestamp",
) -> DataFrame:
    """Rows where the gap to the next bar exceeds ``interval_hours``.

    Columns: symbol, gap_start, gap_end, gap_hours (desc by size).
    """
    w = Window.partitionBy(entity_col).orderBy(time_col)
    nxt = F.lead(time_col, 1).over(w)
    gap_hours = (F.unix_timestamp(nxt) - F.unix_timestamp(F.col(time_col))) / 3600.0
    return (
        klines.select(
            F.col(entity_col).alias("symbol"),
            F.col(time_col).alias("gap_start"),
            nxt.alias("gap_end"),
            gap_hours.alias("gap_hours"),
        )
        .filter(F.col("gap_hours") > interval_hours)
        .orderBy(F.col("gap_hours").desc(), "symbol", "gap_start")
    )
