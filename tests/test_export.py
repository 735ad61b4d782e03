"""Training-shard export: deterministic placement, balanced shards,
manifest integrity, read-back validation."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from binancedatapipeline_spark.textops.export import (
    read_training_shards,
    write_training_shards,
)


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("document body "), F.col("id").cast("string")).alias("text"),
        (F.pmod(F.xxhash64("id"), 200) + 10).alias("n_tokens"),
    )


def test_sharding_is_deterministic_and_balanced(spark, tmp_path):
    docs = _docs(spark)
    m1 = write_training_shards(docs, str(tmp_path / "a"), n_shards=8, seed=7)
    m2 = write_training_shards(docs, str(tmp_path / "b"), n_shards=8, seed=7)
    assert m1["n_shards"] == 8 and m1["total_rows"] == 2000

    def assignment(p):
        return {
            r["doc_id"]: r["__shard"]
            for r in spark.read.parquet(p).select("doc_id", "__shard").collect()
        }

    a, b = assignment(str(tmp_path / "a")), assignment(str(tmp_path / "b"))
    assert a == b  # same seed -> bit-identical placement across runs
    # one file per shard, rows sum to the corpus, shards balanced
    rows = [s["rows"] for s in m1["shards"]]
    assert sum(rows) == 2000 and all(len(s["files"]) == 1 for s in m1["shards"])
    assert max(rows) - min(rows) < 2000 // 8  # well under one shard's worth

    m3 = write_training_shards(docs, str(tmp_path / "c"), n_shards=8, seed=8)
    c = assignment(str(tmp_path / "c"))
    assert c != a  # a new seed is a different permutation


def test_rows_and_tokens_sizing_modes(spark, tmp_path):
    docs = _docs(spark)
    m = write_training_shards(docs, str(tmp_path / "r"), rows_per_shard=300)
    assert m["n_shards"] == 7  # ceil(2000/300)

    total_tokens = docs.agg(F.sum("n_tokens")).first()[0]
    mt = write_training_shards(
        docs, str(tmp_path / "t"), tokens_per_shard=total_tokens // 5,
        token_col="n_tokens",
    )
    assert mt["n_shards"] in (5, 6)
    assert sum(s["tokens"] for s in mt["shards"]) == mt["total_tokens"]

    with pytest.raises(ValueError, match="exactly one"):
        write_training_shards(docs, str(tmp_path / "x"), n_shards=2, rows_per_shard=5)
    with pytest.raises(ValueError, match="token_col"):
        write_training_shards(docs, str(tmp_path / "y"), tokens_per_shard=100)


def test_within_shard_order_reproduces(spark, tmp_path):
    docs = _docs(spark, 500)
    write_training_shards(docs, str(tmp_path / "o1"), n_shards=3, seed=1)
    write_training_shards(docs, str(tmp_path / "o2"), n_shards=3, seed=1)
    for k in range(3):
        o1 = [
            r["doc_id"]
            for r in spark.read.parquet(str(tmp_path / "o1" / f"__shard={k}")).collect()
        ]
        o2 = [
            r["doc_id"]
            for r in spark.read.parquet(str(tmp_path / "o2" / f"__shard={k}")).collect()
        ]
        assert o1 == o2 and len(o1) > 0
        assert o1 != sorted(o1)  # shuffled, not id order


def test_read_back_validates_manifest(spark, tmp_path):
    docs = _docs(spark, 400)
    write_training_shards(docs, str(tmp_path / "v"), n_shards=4)
    back = read_training_shards(spark, str(tmp_path / "v"))
    assert back.count() == 400

    # a hand-deleted shard file fails loudly
    d = str(tmp_path / "v" / "__shard=0")
    victim = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
    os.unlink(os.path.join(d, victim))
    with pytest.raises(ValueError, match="shard 0"):
        read_training_shards(spark, str(tmp_path / "v"))


def test_empty_corpus_and_reserved_column_raise(spark, tmp_path):
    empty = _docs(spark).filter("doc_id < 0")
    with pytest.raises(ValueError, match="empty"):
        write_training_shards(empty, str(tmp_path / "e"), n_shards=2)
    bad = _docs(spark).withColumn("__shard", F.lit(1))
    with pytest.raises(ValueError, match="reserved"):
        write_training_shards(bad, str(tmp_path / "s"), n_shards=2)


def test_all_null_tokens_fall_back_to_one_shard(spark, tmp_path):
    docs = _docs(spark, 100).withColumn("n_tokens", F.lit(None).cast("long"))
    m = write_training_shards(
        docs, str(tmp_path / "nulls"), tokens_per_shard=1000, token_col="n_tokens"
    )
    assert m["n_shards"] == 1 and m["total_tokens"] == 0
    assert m["shards"][0]["rows"] == 100 and m["shards"][0]["tokens"] == 0


def test_jsonl_export_round_trips(spark, tmp_path):
    docs = _docs(spark, 300)
    m = write_training_shards(
        docs.select("doc_id", "text"), str(tmp_path / "jl"),
        n_shards=3, file_format="json", compression="gzip",
    )
    assert m["format"] == "json"
    import glob

    files = glob.glob(str(tmp_path / "jl" / "__shard=*" / "*.json.gz"))
    assert len(files) == 3
    back = read_training_shards(spark, str(tmp_path / "jl"))
    assert back.count() == 300
    assert {r["doc_id"] for r in back.limit(5).collect()} <= set(range(300))
    with pytest.raises(ValueError, match="file_format"):
        write_training_shards(docs, str(tmp_path / "bad"), n_shards=2,
                              file_format="csvish")
