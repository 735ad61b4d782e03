"""Queries rotated OUT of the 50-slot driver registry stay verified
here, verbatim against DuckDB — retirement frees a correctness slot,
it must never drop coverage (registry-comment contract)."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("supplier", "lineitem", "documents"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    yield c
    c.close()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_retired_word_count_matches_duckdb(spark, con):
    got = _rows(entry_mod.q_word_count(spark, SF))
    exp = sorted(
        map(
            tuple,
            con.execute(
                "SELECT tok AS token, count(*) AS n FROM (SELECT unnest("
                "string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')"
                ") AS tok FROM documents) GROUP BY tok ORDER BY n DESC, tok LIMIT 20"
            ).fetchall(),
        )
    )
    assert got == exp and len(got) == 20


def test_retired_semi_join_matches_duckdb(spark, con):
    got = _rows(entry_mod.q_semi_join(spark, SF))
    exp = sorted(
        map(
            tuple,
            con.execute(
                "SELECT s_suppkey, s_name, s_nationkey FROM supplier s "
                "WHERE EXISTS (SELECT 1 FROM lineitem l WHERE "
                "l.l_suppkey = s.s_suppkey AND "
                "l.l_shipdate >= TIMESTAMP '2001-01-01')"
            ).fetchall(),
        )
    )
    assert got == exp and len(got) > 0
