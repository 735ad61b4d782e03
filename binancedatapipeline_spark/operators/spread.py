"""Parallelism repair for narrow inputs feeding CPU-bound kernels.

A parquet file written as a single row group is read by Spark as a
single non-empty partition no matter how small
``spark.sql.files.maxPartitionBytes`` is (splits are byte ranges, but
every row group lands in exactly one split) — so a tokenise/md5-heavy
pipeline over it runs on ONE core of the cluster. ``spread`` is the
standard fix: round-robin repartition up to the session default
parallelism, but only when the input is under-partitioned, so at real
scale (many files / row groups) it is a provable no-op and costs no
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure ``df`` has at least ``min_partitions`` (default: the
    session's ``defaultParallelism``) partitions.

    No-op when the input already meets the target — the check reads
    the compiled plan's partition count, it does not execute the
    query. Use ahead of CPU-bound per-row kernels (shingling, hashing,
    regex scoring) where a narrow input would serialize the work;
    don't bother ahead of plain scans/filters, where the shuffle buys
    nothing.
    """
    # streaming DataFrames can't be probed (df.rdd is illegal) and
    # their micro-batch partitioning is the source's to decide — the
    # per-row kernels spread guards are streaming-safe as-is
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    # the partition probe compiles the plan driver-side (one Py4J
    # round-trip, no job); memoize it on the DataFrame object itself
    # so repeated query builds over a cached table handle pay it once.
    # Storing on the object (not a module dict keyed by id()) ties the
    # cache's lifetime to the DataFrame, so recycled CPython ids can't
    # resurrect a stale count.
    n = getattr(df, "_spread_partition_count", None)
    if n is None:
        n = df.rdd.getNumPartitions()
        df._spread_partition_count = n
    if n >= target:
        return df
    return df.repartition(target)
