"""Skew mitigation: salted two-phase aggregation and salted joins.

AQE's skew-join splitting (enabled in session.py) handles skewed
SHUFFLE JOINS at runtime, but a skewed GROUP BY key — one symbol with
100× the rows of the rest, the classic hot-entity problem at 100 TB —
still funnels one reducer. The fix is the standard salt/unsalt
two-phase aggregation:

  phase 1: group by (key, salt) where salt = pmod(hash-ish, n_salts)
           → n_salts partial aggregates per hot key, spread across
           reducers (map-side combine still applies)
  phase 2: group by key, merge the partials

Only algebraic aggregates (sum/count/min/max and anything derivable
from them, e.g. avg = sum/count) can be merged this way — the helper
takes explicit (partial, merge) pairs to keep that contract visible.

``salted_join`` broadcasts an exploded salt range on the small side —
the replicate-the-dim trick for joins too skewed even for AQE.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, n_salts: int = 16, salt_col: str = SALT_COL) -> DataFrame:
    """Deterministic row salt in [0, n_salts) — spreads hot keys
    without RNG (monotonically_increasing_id is per-partition unique,
    so the low bits alternate within every partition)."""
    return df.withColumn(
        salt_col, F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    merge_aggs: Sequence[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``partial_aggs`` run per (keys + salt); ``merge_aggs`` combine the
    partials per keys. Example — skew-safe sum and count::

        salted_agg(
            df, ["symbol"],
            partial_aggs=[F.sum("v").alias("s"), F.count(F.lit(1)).alias("c")],
            merge_aggs=[F.sum("s").alias("total"), F.sum("c").alias("n")],
        )
    """
    phase1 = (
        with_salt(df, n_salts)
        .groupBy(*keys, SALT_COL)
        .agg(*partial_aggs)
        .drop(SALT_COL)
    )
    return phase1.groupBy(*keys).agg(*merge_aggs)


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed fact table to a small dim by replicating the dim
    across all salts: fact rows carry one salt, dim rows explode to
    every salt, the join key becomes (on + salt) so one hot key's rows
    land on n_salts reducers instead of one. The dim side must be
    broadcast-small × n_salts.

    Only ``inner`` and ``left`` are supported: for right/full outer
    joins the exploded dim side would emit each unmatched dim row
    n_salts times, silently duplicating output rows."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: an "
            "outer dim side is replicated n_salts times and would "
            "duplicate unmatched dim rows"
        )
    salted_facts = with_salt(facts, n_salts)
    salted_dim = dim.withColumn(
        SALT_COL,
        F.explode(F.expr(f"sequence(0, {n_salts - 1})")),
    ).withColumn(SALT_COL, F.col(SALT_COL).cast("int"))
    out = salted_facts.join(
        F.broadcast(salted_dim), on=[*on, SALT_COL], how=how
    )
    return out.drop(SALT_COL)
