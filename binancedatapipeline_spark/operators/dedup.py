"""Dedup-by-key with deterministic keep-first / keep-last semantics.

The reference deduplicates every fetch result with pandas
``drop_duplicates(subset=PK, keep='last')`` (keep='first' for
backward-paginated options) — crypto_data_pipeline_duckdb.py:1059,
1191; crypto_data_pipline_clickhouse.py:1181-1185 — where "last"
means concat order, which is nondeterministic under parallel fetch.
Spark's ``dropDuplicates(PK)`` keeps an *arbitrary* row, so these
operators take an explicit ordering column and use ``row_number``
to make keep-last/keep-first deterministic and distributed.

One shuffle on the key columns; partial aggregation does not apply,
but AQE handles skewed keys. At scale prefer calling this after a
repartition on the same keys the next stage needs, so the shuffle is
reused.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dedup(df: DataFrame, keys: Sequence[str], order: Sequence[Column | str]) -> DataFrame:
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_keep_last(df: DataFrame, keys: Sequence[str], order_col: str) -> DataFrame:
    """Keep, per key, the row with the greatest ``order_col``."""
    return _dedup(df, keys, [F.col(order_col).desc_nulls_last()])


def dedup_keep_first(df: DataFrame, keys: Sequence[str], order_col: str) -> DataFrame:
    """Keep, per key, the row with the smallest ``order_col``."""
    return _dedup(df, keys, [F.col(order_col).asc_nulls_last()])
