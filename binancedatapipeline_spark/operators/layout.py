"""Storage-layout operators: small-file compaction and sorted
(clustered) writes.

At 100 TB the dominant cost of a scan is often not CPU but layout:
a table written by thousands of streaming micro-batches degenerates
into millions of KB-sized files (per-file open/footer overhead and
driver listing time dominate), and an unsorted table forces every
filtered scan to read all row groups because parquet min/max stats
span the whole key range. The reference pipeline sidesteps both by
owning one writer (ClickHouse merges parts in the background;
crypto_data_pipeline_duckdb.py relies on the DB's clustered primary
key); a file-based lakehouse has to do the maintenance itself:

- :func:`compact_small_files` — coalesce a directory's worth of tiny
  parquet files into ~``target_mb`` outputs. Sizes come from the
  Hadoop FileSystem API, so the same code paths work on local disk,
  HDFS, or an object store.
- :func:`sorted_write` — range-repartition on the clustering key and
  sort within partitions before writing, so each output file owns a
  disjoint key range and parquet min/max stats actually prune.

Both are metadata + one exchange; no driver-side data movement.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _fs_bytes(spark: SparkSession, uris: list[str]) -> int:
    """Total size of ``uris`` via the Hadoop FileSystem API (works for
    file://, hdfs://, s3a:// alike; only driver-side metadata calls)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    total = 0
    for uri in uris:
        path = jvm.org.apache.hadoop.fs.Path(uri)
        fs = path.getFileSystem(conf)
        total += fs.getFileStatus(path).getLen()
    return total


def input_bytes(spark: SparkSession, df: DataFrame) -> int:
    """Bytes backing a file-sourced DataFrame (sum of its input files)."""
    return _fs_bytes(spark, list(df.inputFiles()))


def target_partitions(total_bytes: int, target_mb: int = 256) -> int:
    """File count that lands each output near ``target_mb``. Parquet
    re-encodes (dictionary + page compression), so the on-disk output
    is usually smaller than the input estimate — acceptable: erring
    toward fewer, larger files is the point of compaction."""
    return max(1, math.ceil(total_bytes / (target_mb * 1024 * 1024)))


def compact_small_files(
    spark: SparkSession,
    src: str,
    dest: str,
    target_mb: int = 256,
    partition_by: tuple[str, ...] = (),
) -> int:
    """Rewrite ``src`` (parquet) into ``dest`` with ~``target_mb``
    files. Returns the number of output partitions used.

    Uses ``coalesce`` (narrow — no shuffle) when shrinking the file
    count, which is the compaction case by definition. With
    ``partition_by``, repartitions on the partition columns instead so
    each hive partition is written by the tasks that own it (one file
    per partition-value per task otherwise explodes the file count
    right back)."""
    df = spark.read.parquet(src)
    n = target_partitions(input_bytes(spark, df), target_mb)
    if partition_by:
        out = df.repartition(n, *partition_by)
        writer = out.write.partitionBy(*partition_by)
    else:
        out = df.coalesce(n)
        writer = out.write
    writer.mode("overwrite").parquet(dest)
    return n


def zorder_key(
    df: DataFrame,
    cols: tuple[str, ...],
    bits: int = 8,
    out_col: str = "__z",
    relative_error: float = 0.01,
) -> DataFrame:
    """Add a Z-order (Morton) key interleaving quantile-bucket ranks
    of ``cols`` — the multi-dimensional generalization of single-key
    clustering: sorting by the Z key gives every dimension locality,
    so a scan filtered on ANY subset of ``cols`` prunes files, not
    just a sort-prefix.

    Per column, ``approxQuantile`` (one pass, driver gets ``2^bits``
    cut points — metadata, not data) defines equi-DEPTH buckets, so
    skewed columns still spread across the full rank range where
    equi-width bucketing would collapse them into one bucket. The
    rank lookup and bit interleave are pure JVM expressions.
    """
    n_buckets = 1 << bits
    qs = [i / n_buckets for i in range(1, n_buckets)]
    # rank columns first (each cut-point scan runs ONCE per row), then
    # the interleave reads the small rank values
    rank_cols = {}
    for dim, c in enumerate(cols):
        cuts = df.approxQuantile(c, qs, relative_error)
        uniq = sorted(set(cuts))  # dedupe for low-cardinality columns
        arr = ", ".join(repr(float(v)) for v in uniq)
        rank_cols[f"__r{dim}"] = F.expr(
            f"size(filter(array({arr}), b -> b <= cast({c} as double)))"
        )
    # interleave: bit i of every rank goes to position i*len(cols)+dim
    terms = []
    for dim in range(len(cols)):
        for i in range(bits):
            terms.append(
                f"(shiftleft(shiftright(__r{dim}, {i}) & 1, {i * len(cols) + dim}))"
            )
    return (
        df.withColumns(rank_cols)
        .withColumn(out_col, F.expr(" + ".join(terms)).cast("long"))
        .drop(*rank_cols)
    )


def zorder_write(
    df: DataFrame,
    dest: str,
    cols: tuple[str, ...],
    n_files: int,
    bits: int = 8,
) -> None:
    """Write ``df`` Z-order-clustered on ``cols``: each output file
    covers a compact hyper-rectangle of the key space, so parquet
    footer min/max stats prune scans filtered on any of ``cols``
    (a single-key sort only prunes its prefix). One exchange + one
    local sort, same cost shape as :func:`sorted_write`."""
    keyed = zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(dest)
    )


def sorted_write(
    df: DataFrame,
    dest: str,
    sort_cols: tuple[str, ...],
    n_files: int | None = None,
    partition_by: tuple[str, ...] = (),
) -> None:
    """Write ``df`` clustered on ``sort_cols``: range-repartition so
    each output file owns a disjoint key range, then sort within
    partitions so row groups are internally ordered. A later scan
    filtered on a ``sort_cols`` prefix prunes whole files from the
    parquet footer min/max stats instead of reading everything —
    the file-layout analog of the reference's (symbol, timestamp)
    clustered primary key (clickhouse_handler.py ORDER BY).

    One exchange (the range partitioner samples the key distribution,
    so skewed keys still split evenly) + one local sort; no driver
    involvement."""
    out = (
        df.repartitionByRange(n_files, *sort_cols)
        if n_files
        else df.repartitionByRange(*sort_cols)
    )
    out = out.sortWithinPartitions(*sort_cols)
    writer = out.write
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.mode("overwrite").parquet(dest)
