"""Streaming Count-Min maintenance: per-batch sketches PK-upserted
under (batch_id, row, bucket) so retries replace rather than
double-count, with read_corpus_sketch folding the batches into the
standard sketch relation."""

from __future__ import annotations

import time

from pyspark.sql import functions as F
from pyspark.sql import types as T

from binancedatapipeline_spark.catalog import TableSpec
from binancedatapipeline_spark.streaming.jobs import (
    read_corpus_sketch,
    stream_token_sketch,
)
from binancedatapipeline_spark.textops.sketch import cms_build, cms_estimate
from binancedatapipeline_spark.warehouse import Warehouse

SKETCH_SPEC = TableSpec(
    name="tok_sketch",
    primary_keys=("batch_id", "row", "bucket"),
    schema=T.StructType([
        T.StructField("batch_id", T.LongType()),
        T.StructField("row", T.IntegerType()),
        T.StructField("bucket", T.LongType()),
        T.StructField("cnt", T.LongType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
    ]),
    kind="fact",
)

CHUNKS = [
    [(1, "alpha beta alpha gamma"), (2, "beta beta delta")],
    [(3, "alpha epsilon"), (4, "gamma gamma gamma zeta")],
    [(5, "delta alpha beta")],
]


def _run_stream(spark, tmp_path, depth=4, width=2048):
    stage = str(tmp_path / "in")
    for rows in CHUNKS:
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
            "append"
        ).parquet(stage)
        time.sleep(1.05)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    stream = (
        spark.readStream.schema(spark.read.parquet(stage).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    seen = []
    q = stream_token_sketch(
        stream, wh, SKETCH_SPEC,
        checkpoint_dir=str(tmp_path / "ckpt"),
        depth=depth, width=width,
        on_batch=lambda bid, n: seen.append((bid, n)),
    )
    assert q.awaitTermination(300), "stream did not finish"
    return wh, seen


def test_folded_stream_sketch_equals_batch_build(spark, tmp_path):
    wh, seen = _run_stream(spark, tmp_path)
    assert len(seen) == 3
    folded = read_corpus_sketch(wh, SKETCH_SPEC)

    all_rows = [r for rows in CHUNKS for r in rows]
    corpus = spark.createDataFrame(all_rows, "doc_id long, text string")
    toks = corpus.select(
        F.explode(F.split(F.lower("text"), " ")).alias("tok")
    )
    batch = cms_build(toks, "tok", depth=4, width=2048)

    got = {(r.row, r.bucket): r.cnt for r in folded.collect()}
    exp = {(r.row, r.bucket): r.cnt for r in batch.collect()}
    assert got == exp

    # and the folded relation is a first-class sketch: exact estimates
    keys = spark.createDataFrame([("alpha",), ("gamma",), ("zeta",)], "tok string")
    est = {r.tok: r.est for r in cms_estimate(folded, keys, "tok").collect()}
    assert est == {"alpha": 4, "gamma": 4, "zeta": 1}


def test_batch_replay_replaces_not_doubles(spark, tmp_path):
    """The foreachBatch retry contract: re-upserting a batch's sketch
    under the same batch_id must leave the fold unchanged."""
    wh, _ = _run_stream(spark, tmp_path)
    before = {(r.row, r.bucket): r.cnt
              for r in read_corpus_sketch(wh, SKETCH_SPEC).collect()}

    # replay batch 0 exactly as the handler would
    toks = spark.createDataFrame(CHUNKS[0], "doc_id long, text string").select(
        F.explode(F.split(F.lower("text"), " ")).alias("tok")
    )
    sk0 = cms_build(toks, "tok", depth=4, width=2048).withColumn(
        "batch_id", F.lit(0).cast("long")
    )
    wh.upsert(SKETCH_SPEC, sk0)

    after = {(r.row, r.bucket): r.cnt
             for r in read_corpus_sketch(wh, SKETCH_SPEC).collect()}
    assert after == before


def test_geometry_guard_refuses_mismatched_state(spark, tmp_path):
    """Stored cells in one hash geometry + a restart configured with
    another must fail loudly, not fold garbage."""
    wh, _ = _run_stream(spark, tmp_path, depth=4, width=2048)

    stage = str(tmp_path / "in2")
    spark.createDataFrame([(9, "omega")], "doc_id long, text string").coalesce(
        1
    ).write.mode("append").parquet(stage)
    stream = (
        spark.readStream.schema(spark.read.parquet(stage).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = stream_token_sketch(
        stream, wh, SKETCH_SPEC,
        checkpoint_dir=str(tmp_path / "ckpt2"),
        depth=5, width=4096,  # different geometry, same table
    )
    from pyspark.errors.exceptions.captured import StreamingQueryException

    try:
        q.awaitTermination(300)
        exc = q.exception()
        assert exc is not None and "geometry" in str(exc)
    except StreamingQueryException as e:
        assert "geometry" in str(e)
