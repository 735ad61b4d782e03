"""Property tests (hypothesis) for the upsert/dedup invariants the
reference relies on: replay idempotence and keep-last semantics
(SURVEY §5 "Upsert/idempotency property tests")."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from binancedatapipeline_spark.operators.dedup import (
    dedup_keep_first,
    dedup_keep_last,
)
from binancedatapipeline_spark.operators.upsert import upsert

# rows: (key, seq, value) with small key space to force collisions
ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),
        st.integers(min_value=0, max_value=50),
        st.integers(min_value=-1000, max_value=1000),
    ),
    min_size=1,
    max_size=40,
)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    pdf = pd.DataFrame(rows, columns=["k", "seq", "v"]).astype("int64")
    return spark.createDataFrame(pdf)


@given(rows=ROWS)
@_SETTINGS
def test_dedup_keep_last_takes_max_seq(spark, rows):
    got = {
        (r["k"], r["seq"])
        for r in dedup_keep_last(_df(spark, rows), ["k"], "seq").collect()
    }
    exp = {}
    for k, seq, _ in rows:
        # ties on seq: operator breaks them deterministically, so only
        # assert the chosen seq equals the max
        exp[k] = max(exp.get(k, -1), seq)
    assert {k for k, _ in got} == set(exp)
    assert all(seq == exp[k] for k, seq in got)


@given(rows=ROWS)
@_SETTINGS
def test_dedup_keep_first_takes_min_seq(spark, rows):
    got = {
        (r["k"], r["seq"])
        for r in dedup_keep_first(_df(spark, rows), ["k"], "seq").collect()
    }
    exp = {}
    for k, seq, _ in rows:
        exp[k] = min(exp.get(k, 10**9), seq)
    assert all(seq == exp[k] for k, seq in got)


@given(rows=ROWS)
@_SETTINGS
def test_upsert_replay_is_idempotent(spark, rows):
    base = dedup_keep_last(_df(spark, rows), ["k"], "seq")
    once = upsert(base, base, keys=["k"])
    twice = upsert(once, base, keys=["k"])
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b
    assert once.select("k").distinct().count() == once.count()


@given(rows=ROWS, extra=ROWS)
@_SETTINGS
def test_upsert_new_rows_win(spark, rows, extra):
    """After upsert(target, updates), every key present in updates has
    the updates row; keys only in target are preserved."""
    target = dedup_keep_last(_df(spark, rows), ["k"], "seq")
    updates = dedup_keep_last(_df(spark, extra), ["k"], "seq")
    merged = upsert(target, updates, keys=["k"])
    got = {r["k"]: (r["seq"], r["v"]) for r in merged.collect()}
    upd = {r["k"]: (r["seq"], r["v"]) for r in updates.collect()}
    tgt = {r["k"]: (r["seq"], r["v"]) for r in target.collect()}
    for k, sv in upd.items():
        assert got[k] == sv
    for k, sv in tgt.items():
        if k not in upd:
            assert got[k] == sv
    assert set(got) == set(upd) | set(tgt)
