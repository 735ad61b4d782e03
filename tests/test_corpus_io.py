"""WET reader: record splitting, header extraction, warcinfo drop,
gzip transparency, downstream-op composability."""

from __future__ import annotations

import gzip


def _wet_bytes() -> bytes:
    recs = [
        (
            "WARC/1.0\r\n"
            "WARC-Type: warcinfo\r\n"
            "WARC-Date: 2024-03-01T00:00:00Z\r\n"
            "Content-Length: 10\r\n"
            "\r\n"
            "software: test\r\n\r\n"
        ),
        (
            "WARC/1.0\r\n"
            "WARC-Type: conversion\r\n"
            "WARC-Target-URI: https://example.com/a\r\n"
            "WARC-Date: 2024-03-01T12:30:00Z\r\n"
            "WARC-Record-ID: <urn:uuid:aaaa-1111>\r\n"
            "Content-Length: 26\r\n"
            "\r\n"
            "first document body text\r\n\r\n"
        ),
        (
            "WARC/1.0\r\n"
            "WARC-Type: conversion\r\n"
            "WARC-Target-URI: https://example.org/b\r\n"
            "WARC-Date: 2024-03-01T12:31:00Z\r\n"
            "Content-Length: 30\r\n"  # no Record-ID → content-hash doc_id
            "\r\n"
            "second doc\nwith two lines\r\n\r\n"
        ),
        (
            "WARC/1.0\r\n"
            "WARC-Type: conversion\r\n"
            "WARC-Target-URI: https://example.net/empty\r\n"
            "WARC-Date: 2024-03-01T12:32:00Z\r\n"
            "Content-Length: 0\r\n"
            "\r\n"
            "\r\n\r\n"
        ),
    ]
    # the reader splits on the version marker itself; records as
    # written above already carry it as their first line
    return "".join(recs).encode()


def test_read_wet_plain_and_gzip(spark, tmp_path):
    from binancedatapipeline_spark.textops.corpus_io import read_wet

    raw = _wet_bytes()
    (tmp_path / "a.wet").write_bytes(raw)
    with gzip.open(tmp_path / "b.wet.gz", "wb") as f:
        f.write(raw)

    for fname in ("a.wet", "b.wet.gz"):
        out = read_wet(spark, str(tmp_path / fname)).orderBy("url")
        rows = out.collect()
        assert [r["url"] for r in rows] == [
            "https://example.com/a",
            "https://example.org/b",
        ]  # warcinfo and the empty record are gone
        a, b = rows
        assert a["doc_id"] == "urn:uuid:aaaa-1111"
        assert a["text"] == "first document body text"
        assert a["length"] == 26
        assert str(a["fetch_time"]).startswith("2024-03-01 12:30")
        assert b["text"] == "second doc\nwith two lines"
        assert len(b["doc_id"]) == 32  # md5 fallback without a record id


def test_read_wet_feeds_downstream_ops(spark, tmp_path):
    from binancedatapipeline_spark.textops.analysis import with_tokens
    from binancedatapipeline_spark.textops.corpus_io import read_wet

    (tmp_path / "c.wet").write_bytes(_wet_bytes())
    docs = read_wet(spark, str(tmp_path / "c.wet"))
    toks = with_tokens(docs)
    got = {r["url"]: r["n_tokens"] for r in toks.collect()}
    assert got["https://example.com/a"] == 4


def test_malformed_headers_yield_nulls_not_errors(spark, tmp_path):
    """A conversion record missing Content-Length/WARC-Date must not
    kill the scan under ANSI mode — fields go NULL, text survives."""
    from binancedatapipeline_spark.textops.corpus_io import read_wet

    rec = (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        "WARC-Target-URI: https://example.com/m\r\n"
        "\r\n"
        "malformed but readable body\r\n\r\n"
    )
    (tmp_path / "m.wet").write_bytes(rec.encode())
    rows = read_wet(spark, str(tmp_path / "m.wet")).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["text"] == "malformed but readable body"
    assert r["fetch_time"] is None and r["length"] is None
    assert len(r["doc_id"]) == 32  # md5 fallback


def test_url_parts_and_canonicalization(spark):
    from binancedatapipeline_spark.textops.corpus_io import with_url_parts

    rows = [
        (1, "HTTPS://Example.COM/Path/?utm_source=x&q=1&fbclid=z#frag"),
        (2, "https://sub.example.co.uk/a/b/"),
        (3, "not a url"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r["doc_id"]: r for r in with_url_parts(df).collect()}
    assert got[1]["host"] == "example.com"
    assert got[1]["url_canonical"] == "https://example.com/Path?q=1"
    assert got[2]["domain"] == "co.uk"  # documented two-label heuristic
    assert got[2]["url_canonical"] == "https://sub.example.co.uk/a/b"
    assert got[3]["url_canonical"] == "not a url"  # unparseable passes through


def test_dedup_by_url_keeps_latest_fetch(spark):
    from datetime import datetime

    from binancedatapipeline_spark.textops.corpus_io import dedup_by_url

    rows = [
        (1, "https://example.com/a?utm_source=x", datetime(2024, 1, 1), "old"),
        (2, "https://example.com/a/", datetime(2024, 2, 1), "new"),
        (3, "https://example.com/b", datetime(2024, 1, 5), "other"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, fetch_time timestamp, text string")
    out = dedup_by_url(df).collect()
    texts = sorted(r["text"] for r in out)
    assert texts == ["new", "other"]  # 1 and 2 collapse; latest fetch wins
    assert sorted(df.columns) == sorted(out[0].asDict().keys())  # no helper cols leak


def test_read_wet_stream_equals_batch(spark, tmp_path):
    """The streaming reader shares the batch parse expressions — a
    file-replayed stream emits exactly the batch rows."""
    from binancedatapipeline_spark.textops.corpus_io import (
        read_wet,
        read_wet_stream,
    )

    src = str(tmp_path / "in")
    import os

    os.makedirs(src)
    (tmp_path / "in" / "a.wet").write_bytes(_wet_bytes())

    batch = read_wet(spark, src)
    out_dir = str(tmp_path / "out")
    q = (
        read_wet_stream(spark, src, max_files_per_trigger=1)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = spark.read.parquet(out_dir)
    b = sorted(tuple(r) for r in batch.collect())
    s = sorted(tuple(r) for r in streamed.collect())
    assert b == s and len(b) == 2
