"""DSIR importance resampling: planted-domain separation, Gumbel
determinism, smoothing/unseen-bucket handling, scale-shape plan pins."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from binancedatapipeline_spark.textops import dsir

TARGET_VOCAB = [
    "market", "price", "volume", "asset", "trade", "index", "margin",
    "futures", "spot", "funding", "rate", "premium", "hedge", "basis",
]
JUNK_VOCAB = [
    "zzz", "click", "here", "free", "winner", "lottery", "casino",
    "pills", "xxx", "offer", "deal", "buy", "now", "spam",
]


def _doc(rng, vocab, n=30):
    return " ".join(rng.choice(vocab) for _ in range(n))


@pytest.fixture(scope="module")
def corpora(spark):
    rng = random.Random(7)
    raw = [(f"fin-{i}", _doc(rng, TARGET_VOCAB)) for i in range(200)] + [
        (f"junk-{i}", _doc(rng, JUNK_VOCAB)) for i in range(200)
    ]
    rng.shuffle(raw)
    target = [(f"t-{i}", _doc(rng, TARGET_VOCAB)) for i in range(60)]
    return (
        spark.createDataFrame(raw, ["doc_id", "text"]),
        spark.createDataFrame(target, ["doc_id", "text"]),
    )


def test_bucket_distribution_is_bounded(spark, corpora):
    raw, _ = corpora
    dist = dsir.bucket_distribution(raw, buckets=512)
    rows = dist.collect()
    assert 0 < len(rows) <= 512
    assert all(0 <= r["bucket"] < 512 for r in rows)
    # total mass = total n-gram count (uni + bi, empties dropped)
    n_tokens = 30
    assert sum(r["n"] for r in rows) == 400 * (n_tokens + n_tokens - 1)


def test_score_separates_planted_domains(spark, corpora):
    raw, target = corpora
    t = dsir.bucket_distribution(target, buckets=512)
    r = dsir.bucket_distribution(raw, buckets=512)
    ratio, default = dsir.importance_log_ratio(t, r, buckets=512)
    scored = dsir.score_importance(raw, ratio, default, buckets=512)
    rows = scored.select("doc_id", "dsir_logw").collect()
    fin = [r["dsir_logw"] for r in rows if r["doc_id"].startswith("fin")]
    junk = [r["dsir_logw"] for r in rows if r["doc_id"].startswith("junk")]
    # complete separation on disjoint vocabularies
    assert min(fin) > max(junk)


def test_dsir_select_prefers_target_like(spark, corpora):
    raw, target = corpora
    picked = dsir.dsir_select(raw, target, k=100, buckets=512, exact=True)
    assert picked.count() == 100
    ids = [r["doc_id"] for r in picked.select("doc_id").collect()]
    fin = sum(1 for i in ids if i.startswith("fin"))
    assert fin >= 90  # Gumbel noise may admit a few junk docs, not many


def test_dsir_select_deterministic_and_seed_sensitive(spark, corpora):
    raw, target = corpora
    a = {r["doc_id"] for r in dsir.dsir_select(
        raw, target, k=50, buckets=512, seed=1, exact=True).collect()}
    b = {r["doc_id"] for r in dsir.dsir_select(
        raw, target, k=50, buckets=512, seed=1, exact=True).collect()}
    c = {r["doc_id"] for r in dsir.dsir_select(
        raw, target, k=50, buckets=512, seed=2, exact=True).collect()}
    assert a == b  # replay-identical
    assert a != c  # a different seed re-draws the Gumbel keys


def test_dsir_select_approx_path_close_to_k(spark, corpora):
    raw, target = corpora
    picked = dsir.dsir_select(raw, target, k=120, buckets=512, exact=False)
    n = picked.count()
    assert abs(n - 120) <= 20  # sketch-error tolerance at this tiny scale
    assert "dsir_logw" in picked.columns and "__key" not in picked.columns


def test_unseen_buckets_and_empty_text_are_defined(spark, corpora):
    raw, target = corpora
    t = dsir.bucket_distribution(target, buckets=512)
    r = dsir.bucket_distribution(raw, buckets=512)
    ratio, default = dsir.importance_log_ratio(t, r, buckets=512)
    oddballs = spark.createDataFrame(
        [
            ("empty", ""),
            ("unseen", "xylophone quark zeppelin brontosaurus"),
            ("nulltext", None),
        ],
        ["doc_id", "text"],
    )
    rows = {
        row["doc_id"]: row["dsir_logw"]
        for row in dsir.score_importance(
            oddballs, ratio, default, buckets=512
        ).collect()
    }
    assert rows["empty"] == 0.0
    assert rows["nulltext"] == 0.0
    assert rows["unseen"] is not None  # smoothed 0/0 constant, not null


def test_scoring_plan_broadcasts_ratio_table(spark, corpora):
    raw, target = corpora
    t = dsir.bucket_distribution(target, buckets=512)
    r = dsir.bucket_distribution(raw, buckets=512)
    ratio, default = dsir.importance_log_ratio(t, r, buckets=512)
    plan = dsir.score_importance(
        raw, ratio, default, buckets=512
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_k_at_least_n_returns_everything(spark, corpora):
    raw, target = corpora
    assert dsir.dsir_select(raw, target, k=10_000, buckets=512).count() == 400


def test_identical_target_and_raw_zero_weights(spark, corpora):
    """target == raw → every bucket's smoothed ratio is exactly 1 →
    all log-weights exactly 0; selection reduces to the deterministic
    Gumbel hash sample."""
    raw, _ = corpora
    t = dsir.bucket_distribution(raw, buckets=512)
    ratio, default = dsir.importance_log_ratio(t, t, buckets=512)
    scored = dsir.score_importance(raw, ratio, default, buckets=512)
    vals = [r["dsir_logw"] for r in scored.select("dsir_logw").collect()]
    assert all(abs(v) < 1e-12 for v in vals)
