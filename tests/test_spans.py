"""Duplicate-span removal (substring-level dedup): keep-first
semantics, span merging, within-doc repeats, short-doc passthrough."""

from __future__ import annotations

import pytest

from binancedatapipeline_spark.textops import spans

# a 12-token shared passage; tests use window=8 so it yields 5
# overlapping windows that must merge into one maximal span
PASSAGE = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima"


def _uniq(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        ("a", f"{_uniq('ax', 10)} {PASSAGE} {_uniq('ay', 10)}"),
        ("b", f"{_uniq('bx', 4)} {PASSAGE} {_uniq('by', 6)}"),
        ("c", f"{PASSAGE} {_uniq('cz', 9)}"),
        ("short", "tiny doc"),
        ("clean", _uniq("qq", 40)),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_spans_found_in_copies_not_first(spark, corpus):
    found = spans.duplicate_spans(corpus, window=8).collect()
    by_doc = {}
    for r in found:
        by_doc.setdefault(r["doc_id"], []).append((r["span_start"], r["span_end"]))
    # doc "a" holds the lexicographically-first occurrence → exempt
    assert "a" not in by_doc
    # copies get ONE merged maximal span covering the 12-token passage
    assert by_doc["b"] == [(5, 16)]
    assert by_doc["c"] == [(1, 12)]
    assert "short" not in by_doc and "clean" not in by_doc


def test_removal_keeps_one_copy(spark, corpus):
    out = spans.remove_duplicate_spans(corpus, window=8)
    texts = {r["doc_id"]: r["text"] for r in out.collect()}
    assert PASSAGE in texts["a"]  # first occurrence survives
    assert PASSAGE not in texts["b"] and PASSAGE not in texts["c"]
    # surrounding unique tokens untouched
    assert texts["b"].split() == (_uniq("bx", 4) + " " + _uniq("by", 6)).split()
    assert texts["c"].split() == _uniq("cz", 9).split()
    # untouched docs pass through byte-identical
    assert texts["short"] == "tiny doc"
    assert texts["clean"] == _uniq("qq", 40)


def test_within_doc_repeat_removed_once(spark):
    doc = f"{PASSAGE} {_uniq('mid', 5)} {PASSAGE}"
    df = spark.createDataFrame([("solo", doc)], ["doc_id", "text"])
    out = spans.remove_duplicate_spans(df, window=8)
    text = out.collect()[0]["text"]
    assert text.count("alpha bravo") == 1  # second occurrence cut
    assert text.split()[:12] == PASSAGE.split()
    assert "mid0" in text


def test_keep_first_false_erases_all(spark, corpus):
    out = spans.remove_duplicate_spans(corpus, window=8, keep_first=False)
    texts = {r["doc_id"]: r["text"] for r in out.collect()}
    for d in ("a", "b", "c"):
        assert PASSAGE not in texts[d]


def test_output_col_preserves_original(spark, corpus):
    out = spans.remove_duplicate_spans(corpus, window=8, output_col="cleaned")
    row = {r["doc_id"]: r for r in out.collect()}["b"]
    assert PASSAGE in row["text"] and PASSAGE not in row["cleaned"]


def test_shuffle_carries_hashes_not_text(spark, corpus):
    plan = (
        spans.duplicate_spans(corpus, window=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
