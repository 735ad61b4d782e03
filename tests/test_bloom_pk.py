"""Parquet bloom filters declared on TableSpec.bloom_filters: every
warehouse data write (overwrite / upsert / maintain) carries them, so
equality point reads skip row groups even in partitions whose footer
min/max spans the whole key domain (freshly upserted, not yet
PK-clustered). Footer presence is asserted with parquet-mr through the
session JVM — the same reader Spark's scan uses."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from binancedatapipeline_spark.catalog import TableSpec
from binancedatapipeline_spark.warehouse import Warehouse


def _spec(bloom):
    return TableSpec(
        name="bloomy",
        primary_keys=("symbol", "ts"),
        schema=T.StructType(
            [
                T.StructField("symbol", T.StringType()),
                T.StructField("ts", T.TimestampType()),
                T.StructField("v", T.DoubleType()),
            ]
        ),
        kind="fact",
        time_column="ts",
        partition_date_source="ts",
        bloom_filters=bloom,
    )


def _rows(spark, n, day, offset=0):
    # md5 keys and ONE input partition: the file's distinct-key bytes
    # must overflow the 1 MiB parquet dictionary page, because
    # parquet-mr OMITS the bloom for a fully dictionary-encoded chunk
    # (the dictionary already filters row groups exactly) — blooms
    # materialize precisely where they're needed, on chunks whose key
    # set fell back to plain encoding. 60k x 32-byte keys ~ 1.9 MiB.
    return spark.range(n).coalesce(1).select(
        F.md5((F.col("id") + offset).cast("string")).alias("symbol"),
        (F.lit(day).cast("timestamp") + F.make_interval(secs=F.col("id"))).alias("ts"),
        F.rand(7).alias("v"),
    )


def _bloom_offsets(spark, table_dir):
    """{column -> has_bloom} for every live parquet file under the
    table, read straight from the footers with parquet-mr."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    out = {}
    for f in glob.glob(os.path.join(table_dir, "**", "*.parquet"), recursive=True):
        infile = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            jvm.org.apache.hadoop.fs.Path(f), conf
        )
        rdr = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(infile)
        try:
            for block in rdr.getRowGroups():
                for col in block.getColumns():
                    name = col.getPath().toDotString()
                    has = col.getBloomFilterOffset() >= 0
                    out[name] = out.get(name, True) and has
        finally:
            rdr.close()
    return out


def test_bloom_filters_written_on_declared_columns_only(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    spec = _spec({"symbol": 100_000})
    wh.overwrite(spec, _rows(spark, 60_000, "2024-01-01"))
    offsets = _bloom_offsets(spark, wh.path(spec.name))
    assert offsets.get("symbol") is True
    assert offsets.get("v") is False
    assert offsets.get("ts") is False

    # the upsert rewrite path carries the blooms too (disjoint keys,
    # new partition — the freshly-ingested-unclustered case)
    wh.upsert(spec, _rows(spark, 60_000, "2024-01-02", offset=1_000_000))
    offsets = _bloom_offsets(spark, wh.path(spec.name))
    assert offsets.get("symbol") is True

    # maintain()'s compaction rewrite keeps them
    wh.maintain(spec, max_files_per_partition=0)
    offsets = _bloom_offsets(spark, wh.path(spec.name))
    assert offsets.get("symbol") is True

    # point read stays correct through the manifest reader
    probe = F.md5(F.lit("7"))
    assert wh.read(spec).filter(F.col("symbol") == probe).count() > 0
    assert wh.read(spec).filter(F.col("symbol") == "NOPE").count() == 0


def test_no_bloom_by_default(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    spec = _spec(None)
    wh.overwrite(spec, _rows(spark, 60_000, "2024-01-01"))
    offsets = _bloom_offsets(spark, wh.path(spec.name))
    assert offsets.get("symbol") is False
