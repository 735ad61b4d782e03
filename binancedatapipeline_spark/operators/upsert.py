"""PK-upsert: new rows replace target rows with the same primary key.

Reproduces the reference's two sink flavors with one distributed
plan:

- DuckDB variant: ``UPDATE ... FROM tmp ON pk`` then ``INSERT ...
  WHERE NOT EXISTS`` (crypto_data_pipeline_duckdb.py:1546-1594);
- ClickHouse variant: blind insert into ReplacingMergeTree +
  ``OPTIMIZE TABLE FINAL`` keep-last dedup
  (crypto_data_pipline_clickhouse.py:1757-1793).

Spark/parquet has no in-place update, so upsert(target, updates) =
``target LEFT ANTI JOIN updates ON pk`` (drop superseded rows)
``UNION ALL updates`` — semantically MERGE WHEN MATCHED UPDATE WHEN
NOT MATCHED INSERT. Replaying an overlapping batch (the reference's
late-data lookback, T3) is idempotent by construction.

Scale notes: the anti join shuffles both sides on the PK unless the
update batch is small — which it almost always is (one micro-batch
vs. the full table) — so we broadcast the update side's keys when it
fits. For 100 TB targets the Warehouse layer bounds rewrite cost by
partition pruning: only date partitions present in the update batch
are read and rewritten.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    order_col: str | None = None,
    broadcast_updates: bool | None = None,
) -> DataFrame:
    """Return target with rows keyed in ``updates`` replaced.

    ``order_col``: if the update batch itself may contain duplicate
    keys (overlapping fetch pages), pass the ordering column whose
    greatest value wins (keep-last, duckdb:1059); None assumes the
    batch is already unique per key.

    ``broadcast_updates``: ``None`` (default) lets the planner/AQE
    pick the join strategy from the batch's actual runtime size — a
    micro-batch broadcasts, a backfill shuffles. ``True`` forces the
    broadcast hint (only for callers that KNOW the batch is small and
    run without AQE); a forced broadcast of a backfill-sized batch
    OOMs executors, which is why it is no longer the default.
    """
    from binancedatapipeline_spark.operators.dedup import dedup_keep_last

    if order_col is not None:
        updates = dedup_keep_last(updates, keys, order_col)
    updates = updates.select(*target.columns)
    anti_side = F.broadcast(updates) if broadcast_updates else updates
    kept = target.join(anti_side, on=list(keys), how="left_anti")
    return kept.unionByName(updates)
