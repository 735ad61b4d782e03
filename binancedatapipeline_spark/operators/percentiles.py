"""Grouped percentiles: exact and sketch-based variants.

The exact form (``percentile``) sorts each group's values — correct
and oracle-checkable, but per-group memory is O(group size), which is
the wrong trade at 100 TB. The approx form is the scale path:
``approx_percentile`` aggregates a bounded Greenwald-Khanna-style
sketch with map-side partial merge, so memory per group is
O(accuracy) regardless of group size, at a rank error of at most
1/accuracy.

Both produce the same column names so callers can swap one for the
other without touching downstream plans; a test pins the approx
result to the exact one within the sketch's rank-error bound.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_percentiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    quantiles: Sequence[float] = (0.5, 0.9),
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """One row per group with ``p<q>_<value_col>`` columns and ``n``.

    ``exact=True``: interpolated exact percentiles (sort-based; use at
    verification scale). ``exact=False``: approx_percentile sketch —
    the 100 TB path; rank error ≤ 1/accuracy, memory bounded per
    group.
    """
    aggs = []
    for q in quantiles:
        name = f"p{int(q * 100)}_{value_col}"
        if exact:
            expr = F.expr(f"percentile({value_col}, {q})")
        else:
            expr = F.expr(f"approx_percentile({value_col}, {q}, {accuracy})")
        aggs.append(expr.alias(name))
    aggs.append(F.count(F.lit(1)).alias("n"))
    return df.groupBy(*group_cols).agg(*aggs)
