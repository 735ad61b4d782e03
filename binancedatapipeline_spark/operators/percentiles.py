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
    # ONE aggregate buffer for all quantiles (array form): the scalar
    # form builds one TypedImperativeAggregate buffer PER quantile —
    # each holding every group value and each sorting it independently
    # — so k quantiles cost k copies of the group in memory and k
    # sorts. The array form buffers and sorts the group once and reads
    # all quantiles off the same sorted run; identical interpolation
    # arithmetic, identical output columns. Same shape for the
    # approx_percentile sketch path (one sketch, not k).
    names = [f"p{int(q * 100)}_{value_col}" for q in quantiles]
    qarr = ", ".join(f"CAST({q!r} AS DOUBLE)" for q in quantiles)
    if exact:
        arr = F.expr(f"percentile({value_col}, array({qarr}))")
    else:
        arr = F.expr(f"approx_percentile({value_col}, array({qarr}), {accuracy})")
    out = df.groupBy(*group_cols).agg(
        arr.alias("__ps"), F.count(F.lit(1)).alias("n")
    )
    return out.select(
        *group_cols,
        *[F.col("__ps")[i].alias(name) for i, name in enumerate(names)],
        "n",
    )
