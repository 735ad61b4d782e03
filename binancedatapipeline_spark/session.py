"""SparkSession factory.

The reference pipeline stores timezone-naive-but-UTC timestamps
everywhere (crypto_data_pipeline_duckdb.py:908, 1616) — one wrong
session timezone would shift every join key, so the session is pinned
to UTC. Arrow is enabled for the pandas-kernel slow path, AQE for
runtime re-planning (skew joins, partition coalescing) on a real
cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_session(
    app_name: str = "binancedatapipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or return) the configured SparkSession.

    Defaults target local[] testing but every knob is the one you
    would set on a real cluster: AQE on (runtime skew-join splitting
    and post-shuffle coalescing matter far more at 100 TB than at
    sf0.1), UTC session timezone, Arrow transfers for pandas kernels.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    n_shuffle = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    # AQE stays ON by default — runtime skew-join splitting and
    # post-shuffle coalescing are what survive 100 TB, and that is the
    # posture this engine benchmarks under. The knob exists because
    # the re-plan machinery costs a measured ~20% of wall on
    # sub-second small-data queries (FLAGSHIP round-8 decomposition):
    # an interactive deployment over small warm tables may flip it,
    # exactly as Spark users do in practice.
    aqe = os.environ.get("SPARK_GRAFT_AQE", "1") != "0"
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", str(aqe).lower())
        .config("spark.sql.adaptive.coalescePartitions.enabled", str(aqe).lower())
        .config("spark.sql.adaptive.skewJoin.enabled", str(aqe).lower())
        .config("spark.sql.session.timeZone", "UTC")
        # store tz-naive-UTC; read parquet TIMESTAMP(isAdjustedToUTC=false)
        # as TimestampType (not NTZ) so event-time ops (watermarks) work —
        # with the session pinned to UTC the semantics are identical
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # INT96 (Spark's legacy default) writes NO min/max statistics,
        # so timestamp filters can't skip row groups and the warehouse
        # manifest can't record file-level time bounds. TIMESTAMP_MICROS
        # is the modern annotated-INT64 form: footer stats appear, row-
        # group skipping works, and every engine (Spark/DuckDB/pyarrow)
        # reads it natively.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # InferFiltersFromGenerate turns explode(f(x)) into
        # `Filter size(f(x)) > 0` and pushes it below exchanges — for
        # our text kernels f(x) is a tokenize+md5 transform, so the
        # inferred filter re-evaluates the whole kernel a second time
        # (in the narrow pre-shuffle stage, serializing it). Every
        # generator input here is non-empty by construction
        # (greatest(n, 1) guards), so the rule only costs.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
