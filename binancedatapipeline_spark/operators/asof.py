"""As-of join: match each left row with the latest right row at or
before its timestamp, per key.

The reference's premium join is an exact-grid equi join (J6,
crypto_data_pipeline_duckdb.py:1229-1243) and only works because
both kline tables share the 1h grid; the general time-series
alignment (mixed grids, irregular quotes) needs a true as-of join.
Spark has no built-in one, so this implements the classic
union-and-carry-forward plan:

1. tag right rows 0 and left rows 1, union them aligned on
   (keys, ts, tag, right-payload-or-null);
2. one window per key ordered by (ts, tag):
   ``last(right_payload, ignorenulls=true)`` over unbounded
   preceding — carries the latest right payload forward;
3. keep left rows.

ONE shuffle on the key columns, no range-explosion, no skew beyond
the key distribution — at 100 TB this is the plan you want (both
inputs co-partitioned by key, sorted within partition; Spark's
window exec does exactly that).

Semantics match pandas ``merge_asof(direction='backward',
allow_exact_matches=True)`` and DuckDB ``ASOF JOIN`` with
``l.ts >= r.ts`` (the differential-test oracle). ``tolerance``
bounds staleness like merge_asof's tolerance.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    right_values: Sequence[str],
    tolerance: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of-backward join.

    Output: all left columns + for each v in right_values a column
    ``v`` (or ``v+suffix`` on name clash) + ``{right_time}{suffix}``
    (the matched right timestamp, NULL when no prior right row).
    """
    keys = list(on)
    lcols = left.columns
    out_names = {
        v: (v + suffix if v in lcols else v) for v in right_values
    }
    matched_ts = right_time + suffix

    r = right.select(
        *keys,
        F.col(right_time).alias("__ts"),
        F.lit(0).alias("__tag"),
        F.struct(
            F.col(right_time).alias("__rts"),
            *[F.col(v).alias(out_names[v]) for v in right_values],
        ).alias("__payload"),
        *[F.lit(None).alias(f"__l_{c}") for c in lcols],
    )
    l = left.select(
        *keys,
        F.col(left_time).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
    )
    unioned = r.unionByName(l)
    # __payload in the sort key makes the winner deterministic when
    # multiple right rows share (key, ts): the greatest payload struct
    # wins regardless of partitioning or input order (left rows all
    # carry NULL payloads, so their relative order is immaterial)
    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__tag", "__payload")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "__carry", F.last("__payload", ignorenulls=True).over(w)
    ).filter(F.col("__tag") == 1)
    if tolerance is not None:
        fresh = F.col("__carry.__rts") >= F.col("__ts") - F.expr(f"interval {tolerance}")
        carried = carried.withColumn(
            "__carry", F.when(fresh, F.col("__carry"))
        )
    return carried.select(
        *[F.col(f"__l_{c}").alias(c) for c in lcols],
        F.col("__carry.__rts").alias(matched_ts),
        *[F.col(f"__carry.{out_names[v]}").alias(out_names[v]) for v in right_values],
    )
