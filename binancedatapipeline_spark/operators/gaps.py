"""Time-gap detection over per-entity time series.

Reproduces the reference ``validate_data`` audit
(crypto_data_pipline_clickhouse.py:1920-1953): for each symbol,
compare consecutive timestamps (the reference uses the ClickHouse
LEAD idiom ``anyLast(ts) OVER (... ROWS BETWEEN 1 FOLLOWING AND 1
FOLLOWING)``) and report pairs whose spacing exceeds the expected
bar interval.

Plan shape: one shuffle (partition by entity), one LEAD window, a
filter — all codegen.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def find_time_gaps(
    df: DataFrame,
    entity_cols: Sequence[str],
    time_col: str,
    max_gap_minutes: float,
) -> DataFrame:
    """Rows where the NEXT event for the same entity is more than
    ``max_gap_minutes`` away. Output: entity cols, gap_start, gap_end,
    gap_minutes, ordered by gap size descending."""
    w = Window.partitionBy(*entity_cols).orderBy(time_col)
    nxt = F.lead(time_col, 1).over(w)
    gap_min = (F.unix_timestamp(nxt) - F.unix_timestamp(F.col(time_col))) / 60.0
    return (
        df.select(*entity_cols, F.col(time_col).alias("gap_start"), nxt.alias("gap_end"),
                  gap_min.alias("gap_minutes"))
        .filter(F.col("gap_minutes") > max_gap_minutes)
        .orderBy(F.col("gap_minutes").desc(), *entity_cols, "gap_start")
    )
