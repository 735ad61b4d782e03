"""Streaming ingest with substring-level dedup against all stored
history: each micro-batch probes the warehouse window-hash index,
cuts repeated passages, and keeps the first-ingested copy."""

from __future__ import annotations

import time

from pyspark.sql import types as T

from binancedatapipeline_spark.catalog import TableSpec
from binancedatapipeline_spark.streaming.jobs import stream_span_dedup
from binancedatapipeline_spark.warehouse import Warehouse

DOCS_SPEC = TableSpec(
    name="span_docs_store",
    primary_keys=("doc_id",),
    schema=T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]),
    kind="fact",
)

INDEX_SPEC = TableSpec(
    name="span_hash_index",
    primary_keys=("h",),
    schema=T.StructType([
        T.StructField("h", T.LongType()),
        T.StructField("first_id", T.LongType()),
        T.StructField("first_pos", T.LongType()),
    ]),
    kind="fact",
)

PASSAGE = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima"


def _uniq(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def _run(spark, stage, wh, ckpt):
    stream = (
        spark.readStream.schema(spark.read.parquet(stage).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = stream_span_dedup(
        stream, wh, DOCS_SPEC, INDEX_SPEC, ckpt, span_window=8
    )
    q.awaitTermination(300)


def test_cross_batch_span_dedup_and_replay(spark, tmp_path):
    chunks = [
        [(1, f"{_uniq('a', 4)} {PASSAGE}"), (2, _uniq("b", 30))],
        # 10 copies the passage (cut); 11 is novel; 12 becomes empty
        [(10, f"{PASSAGE} {_uniq('c', 6)}"), (11, _uniq("d", 30)),
         (12, PASSAGE)],
    ]
    stage = str(tmp_path / "in")
    schema = "doc_id long, text string"
    for rows in chunks:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(stage)
        time.sleep(1.05)  # distinct mtimes: FileStreamSource orders by time

    wh = Warehouse(spark, str(tmp_path / "wh"))
    for spec in (DOCS_SPEC, INDEX_SPEC):
        wh.init_table(spec)
    _run(spark, stage, wh, str(tmp_path / "ckpt"))

    docs = {r["doc_id"]: r["text"] for r in wh.read(DOCS_SPEC).collect()}
    assert PASSAGE in docs[1]                       # first-ingested copy kept
    assert PASSAGE not in docs[10]                  # later copy cut
    assert docs[10].split() == _uniq("c", 6).split()
    assert docs[11] == _uniq("d", 30)               # novel doc untouched
    assert 12 not in docs                           # emptied by the cut
    idx_before = wh.read(INDEX_SPEC).count()
    assert idx_before > 0

    # full replay from a fresh checkpoint: warehouse state unchanged
    _run(spark, stage, wh, str(tmp_path / "ckpt2"))
    docs2 = {r["doc_id"]: r["text"] for r in wh.read(DOCS_SPEC).collect()}
    assert docs2 == docs
    assert wh.read(INDEX_SPEC).count() == idx_before
