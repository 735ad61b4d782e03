"""Count-Min sketch: bounded-memory frequency estimation over
unbounded key spaces.

Exact token/n-gram counting over a 100 TB corpus shuffles one state
row per DISTINCT key — for word 5-grams that is more state than the
corpus. A Count-Min sketch caps the state at ``depth x width``
counters regardless of cardinality, with the classic one-sided
guarantee: estimates never undercount, and overcount by more than
``e/width * N`` (N = total weight) with probability at most
``e^-depth`` per key.

Spark-first shape: the sketch IS a DataFrame of at most
``depth x width`` rows — built with one explode + groupBy (map-side
partial aggregation does the heavy fold), merged with union+groupBy,
probed with a broadcast join. No driver arrays, no UDFs, no
``collect`` anywhere in the build, so sketches compose with the rest
of the engine (persist them, upsert them into the warehouse as
incremental state, union them across corpus shards).

Reference parity: the reference engine has no sketch operators; this
is part of the beyond-reference training-data suite (brief: "a novel
sketch" under custom operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 5,
    width: int = 8192,
    weight_col: str | None = None,
) -> DataFrame:
    """Build a Count-Min sketch over ``df[key_col]``.

    Returns the sketch relation ``(row, bucket, cnt)`` with at most
    ``depth x width`` rows (absent cells are implicit zeros). NULL
    keys are ignored (SQL aggregate convention). ``weight_col``
    makes it a weighted sketch (e.g. pre-aggregated counts).

    Plan: per input row, ``depth`` (row, bucket) pairs from one
    inline array explode — xxhash64 seeded by the row index keeps
    the hash family independent and JVM-side — then a single
    groupBy whose partial aggregation collapses each partition to
    <= depth*width cells before the one bounded shuffle."""
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    pairs = df.filter(F.col(key_col).isNotNull()).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(width)).alias(
                            "bucket"
                        ),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("__cell"),
        w.alias("__w"),
    )
    return (
        pairs.select("__cell.row", "__cell.bucket", "__w")
        .groupBy("row", "bucket")
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with identical (depth, width, hash
    family): cell-wise sum. Mergeability is the point — per-shard or
    per-batch sketches fold into a corpus sketch without touching the
    raw data again."""
    return (
        a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 5,
    width: int = 8192,
) -> DataFrame:
    """Point estimates for ``keys[key_col]``: input columns plus
    ``est`` (>= the true count, never under).

    The probe re-derives each key's ``depth`` cells with the same
    seeded hashes and takes the MIN over rows; a cell missing from
    the sketch relation is an implicit zero. The sketch side is
    <= depth*width rows — broadcast, so probing any number of keys
    is shuffle-free on the key side until the final per-key min
    (a groupBy on the probe's own key, which the caller's key list
    is usually small enough to make trivial)."""
    probe = keys.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(width)).alias(
                            "bucket"
                        ),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("__cell"),
    ).select("*", "__cell.row", "__cell.bucket").drop("__cell")
    joined = probe.join(F.broadcast(sketch), ["row", "bucket"], "left").withColumn(
        "__c", F.coalesce(F.col("cnt"), F.lit(0).cast("long"))
    )
    group_cols = [c for c in keys.columns]
    return (
        joined.groupBy(*group_cols)
        .agg(F.min("__c").alias("est"))
    )


def cms_error_bound(sketch: DataFrame, width: int) -> DataFrame:
    """The additive error guarantee as data: one row with ``total_n``
    (total sketched weight, read off any hash row) and ``eps_bound``
    = e/width * N — the overcount no key exceeds with probability
    >= 1 - e^-depth. Lets callers threshold heavy-hitter candidates
    without rescanning the corpus."""
    return (
        sketch.filter(F.col("row") == 0)
        .agg(F.sum("cnt").alias("total_n"))
        .select(
            "total_n",
            (F.lit(2.718281828459045) / F.lit(width) * F.col("total_n")).alias(
                "eps_bound"
            ),
        )
    )
