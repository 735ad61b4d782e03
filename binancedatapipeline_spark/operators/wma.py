"""Rolling linear-weighted moving average as a pure window-sum plan.

The reference computes ``wma120_premium`` with a per-symbol pandas
kernel: ``df.groupby('symbol')[f].transform(lambda x: ta.wma(x,
length=120))`` (crypto_data_pipeline_duckdb.py:1246-1262), i.e.
weights 1..n over exactly the trailing n rows, NULL until the window
is full.

Instead of shipping every group through Python (or building an
O(n·w) ``collect_list`` per row), we use the algebraic identity

    WMA_n(t) = sum_{i=t-n+1..t} x_i * (i - (t-n)) / (n(n+1)/2)
             = [ Sw(t) - (rn_t - n) * S1(t) ] / (n(n+1)/2)

where ``rn`` is the row position within the partition,
``Sw = sum(x * rn)`` and ``S1 = sum(x)`` over ``ROWS n-1 PRECEDING
.. CURRENT``. Both are plain running window sums, so the whole
operator is two whole-stage-codegen window aggregates over ONE
shuffle (partition by symbol) — it scales linearly and never leaves
the JVM. ``rn`` is per-partition, so the ``x*rn`` products stay
small and the subtraction loses no meaningful precision for
n ≈ 10^2..10^6 rows per key.

A pandas ``applyInPandas`` oracle kernel lives in the tests to
cross-check exactness against the reference semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_wma(
    df: DataFrame,
    value_col: str,
    n: int,
    partition_cols: Sequence[str],
    order_col: str,
    output_col: str | None = None,
    exact_decimal: str | None = None,
) -> DataFrame:
    """Add a trailing linear-WMA(n) column computed per partition group.

    NULL for the first n-1 rows of each group (and wherever a NULL
    value falls inside the trailing window), matching the pandas_ta
    warm-up behavior.

    ``exact_decimal`` (e.g. "decimal(18,2)"): when the values sit on
    a fixed decimal grid, run the two window sums exactly so the
    result is bit-identical regardless of aggregation order/engine.
    Implemented as scaled-integer sums, not decimal128 partial
    aggregates: round(x·10^s) is exact on the grid, the bigint window
    sums are exact and codegen as tight long adds (decimal window
    aggregates don't), and only the final divide returns to double —
    same nearest-double result as the decimal-sum-then-cast form,
    since both are correctly-rounded casts of the same exact rational.
    Headroom: Σ|x·rn| ≤ 9.2·10¹⁸ / 10^s per frame; for s=2 and
    frames of n·max_rn products that allows ~10^16 units — plenty.
    """
    output_col = output_col or f"wma{n}_{value_col}"
    w = Window.partitionBy(*partition_cols).orderBy(order_col)
    frame = w.rowsBetween(-(n - 1), 0)
    denom = float(n * (n + 1) / 2)

    rn = F.row_number().over(w)
    tmp_rn = f"__wma_rn_{output_col}"
    out = df.withColumn(tmp_rn, rn)
    val = F.col(value_col)
    if exact_decimal:
        s = int(exact_decimal.rstrip(")").split(",")[1])
        factor = 10 ** s
        xi = F.round(val * factor).cast("bigint")
        sw = F.sum(xi * F.col(tmp_rn)).over(frame).cast("double") / factor
        s1 = F.sum(xi).over(frame).cast("double") / factor
    else:
        sw = F.sum(val * F.col(tmp_rn)).over(frame)
        s1 = F.sum(val).over(frame)
    cnt = F.count(F.col(value_col)).over(frame)
    wma = (sw - (F.col(tmp_rn) - F.lit(n)) * s1) / F.lit(denom)
    return out.withColumn(output_col, F.when(cnt == n, wma)).drop(tmp_rn)


def wma_oracle_sql(
    source: str,
    value_col: str,
    n: int,
    partition_cols: Sequence[str],
    order_col: str,
    output_col: str | None = None,
    extra_cols: Sequence[str] = (),
) -> str:
    """ANSI-SQL rendering of the same plan (runs on DuckDB and Spark SQL),
    used for differential testing."""
    output_col = output_col or f"wma{n}_{value_col}"
    pk = ", ".join(partition_cols)
    denom = float(n * (n + 1) / 2)
    cols = ", ".join([*partition_cols, order_col, value_col, *extra_cols])
    return f"""
WITH __base AS (
  SELECT {cols},
         row_number() OVER (PARTITION BY {pk} ORDER BY {order_col}) AS __rn
  FROM {source}
)
SELECT {cols},
       CASE WHEN count({value_col}) OVER __w = {n} THEN
         (sum({value_col} * __rn) OVER __w - (__rn - {n}) * sum({value_col}) OVER __w) / {denom}
       END AS {output_col}
FROM __base
WINDOW __w AS (PARTITION BY {pk} ORDER BY {order_col}
               ROWS BETWEEN {n - 1} PRECEDING AND CURRENT ROW)
"""
