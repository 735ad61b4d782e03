"""Reproduces FLAGSHIP "parquet bloom filters" numbers: PK point
reads through the warehouse, bloom vs no-bloom, on an unclustered
key-unsorted table (the fresh-ingest shape where min/max bounds
cannot prune).

Usage: python tools/bench_bloom.py [n_rows] [workdir]
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import types as T

from binancedatapipeline_spark.catalog import TableSpec
from binancedatapipeline_spark.session import get_session
from binancedatapipeline_spark.warehouse import Warehouse


def _spec(name: str, bloom) -> TableSpec:
    return TableSpec(
        name=name,
        primary_keys=("key", "ts"),
        schema=T.StructType(
            [
                T.StructField("key", T.StringType()),
                T.StructField("ts", T.TimestampType()),
                T.StructField("v", T.DoubleType()),
            ]
        ),
        kind="fact",
        time_column="ts",
        partition_date_source="ts",
        bloom_filters=bloom,
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/bench_bloom"
    shutil.rmtree(work, ignore_errors=True)
    spark = get_session(app_name="bench_bloom")
    wh = Warehouse(spark, os.path.join(work, "wh"))
    rows = (
        spark.range(n)
        .select(
            F.md5(F.col("id").cast("string")).alias("key"),
            (
                F.lit("2024-01-01").cast("timestamp")
                + F.make_interval(secs=(F.col("id") % 86000))
            ).alias("ts"),
            F.rand(7).alias("v"),
        )
        .coalesce(4)  # big files, many row groups each, key-unsorted
    )
    for name, bloom in (("nb", None), ("wb", {"key": max(n // 4, 1)})):
        sp = _spec(name, bloom)
        wh.overwrite(sp, rows)
        d = wh.read(sp)
        d.filter(F.col("key") == "warm").count()
        t0 = time.perf_counter()
        for i in range(8):  # absent keys: every row group is skippable
            d.filter(F.col("key") == F.md5(F.lit(str(10**9 + i)))).count()
        absent = (time.perf_counter() - t0) / 8
        t0 = time.perf_counter()
        for i in range(8):  # present keys: all but ~1 group skippable
            d.filter(F.col("key") == F.md5(F.lit(str(i * 1000 + 3)))).count()
        present = (time.perf_counter() - t0) / 8
        size = sum(
            os.path.getsize(f)
            for f in glob.glob(
                os.path.join(work, "wh", name, "**", "*.parquet"), recursive=True
            )
        )
        print(
            f"{name}: absent-key {absent:.4f}s  present-key {present:.4f}s  "
            f"bytes {size:,}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
