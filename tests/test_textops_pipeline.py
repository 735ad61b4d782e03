"""Training-data pipeline ops: decontamination, sequence packing,
stable splits/sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from binancedatapipeline_spark.textops.decontam import (
    contamination_hits,
    decontaminate,
)
from binancedatapipeline_spark.textops.packing import pack_sequences
from binancedatapipeline_spark.textops.sampling import (
    hash_sample,
    stable_split,
)


# ------------------------------------------------------- decontamination


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_contamination_flags_exact_ngram_overlap(spark):
    bench = _docs(spark, [(100, "the quick brown fox jumps over the dog")])
    docs = _docs(
        spark,
        [
            # contains "quick brown fox jumps over" (5-gram of bench)
            (1, "intro words then quick brown fox jumps over and out"),
            # shares words but never 5 consecutive ones
            (2, "quick fox brown jumps dog over the lazy cat"),
        ],
    )
    hits = {r["doc_id"]: r["n_hits"] for r in contamination_hits(docs, bench, n=5).collect()}
    assert 1 in hits and hits[1] >= 1
    assert 2 not in hits


def test_decontaminate_removes_only_contaminated(spark):
    bench = _docs(spark, [(100, "alpha beta gamma delta epsilon zeta")])
    docs = _docs(
        spark,
        [
            (1, "x alpha beta gamma delta epsilon y"),
            (2, "completely unrelated clean document text here"),
        ],
    )
    kept = [r["doc_id"] for r in decontaminate(docs, bench, n=5).collect()]
    assert kept == [2]


def test_short_doc_contamination_uses_whole_text_shingle(spark):
    # docs shorter than n tokens shingle to their whole text (the
    # greatest(.., 1) guard) — identical short docs must still match
    bench = _docs(spark, [(100, "tiny doc")])
    docs = _docs(spark, [(1, "tiny doc"), (2, "other text")])
    hits = [r["doc_id"] for r in contamination_hits(docs, bench, n=5).collect()]
    assert hits == [1]


# ------------------------------------------------------- sequence packing


def test_pack_sequences_bins_by_cumulative_budget(spark):
    rows = [("g", i, 300) for i in range(4)]  # cum before: 0,300,600,900
    df = spark.createDataFrame(rows, ["g", "doc_id", "n_tokens"])
    out = {r["doc_id"]: r["seq_id"] for r in pack_sequences(df, 500, ["g"]).collect()}
    assert out == {0: 0, 1: 0, 2: 1, 3: 1}


def test_pack_sequences_is_per_group(spark):
    rows = [("a", 0, 400), ("a", 1, 400), ("b", 2, 400)]
    df = spark.createDataFrame(rows, ["g", "doc_id", "n_tokens"])
    out = {r["doc_id"]: r["seq_id"] for r in pack_sequences(df, 500, ["g"]).collect()}
    # group b restarts at bin 0 regardless of group a's fill level
    assert out == {0: 0, 1: 0, 2: 0}


def test_pack_sequences_oversized_doc_gets_own_bins(spark):
    rows = [("g", 0, 1200), ("g", 1, 100)]
    df = spark.createDataFrame(rows, ["g", "doc_id", "n_tokens"])
    out = {r["doc_id"]: r["seq_id"] for r in pack_sequences(df, 500, ["g"]).collect()}
    # doc 0 starts at bin 0; doc 1 starts after 1200 tokens -> bin 2
    assert out == {0: 0, 1: 2}


# ------------------------------------------------------- stable splits


def test_stable_split_deterministic_and_proportional(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = stable_split(df).groupBy("split").count().collect()
    b = stable_split(df).groupBy("split").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    counts = {r["split"]: r["count"] for r in a}
    assert set(counts) == {"train", "val", "test"}
    assert 0.75 <= counts["train"] / 2000 <= 0.85
    assert 0.05 <= counts["val"] / 2000 <= 0.15
    assert 0.05 <= counts["test"] / 2000 <= 0.15


def test_stable_split_membership_survives_new_data(spark):
    # adding rows must never move an existing id between splits
    small = stable_split(spark.range(0, 500).withColumnRenamed("id", "doc_id"))
    big = stable_split(spark.range(0, 5000).withColumnRenamed("id", "doc_id"))
    joined = small.alias("s").join(
        big.alias("b"), F.col("s.doc_id") == F.col("b.doc_id")
    )
    assert joined.filter(F.col("s.split") != F.col("b.split")).count() == 0


def test_hash_sample_fraction_and_stability(spark):
    df = spark.range(0, 10_000).withColumnRenamed("id", "doc_id")
    s1 = hash_sample(df, "doc_id", 0.1)
    n = s1.count()
    assert 800 <= n <= 1200
    assert s1.exceptAll(hash_sample(df, "doc_id", 0.1)).count() == 0
    # nested property: a 5% sample is a subset of the 10% sample
    s2 = hash_sample(df, "doc_id", 0.05)
    assert s2.join(s1, "doc_id", "left_anti").count() == 0
