"""Corpus-growth curves for the round-6 ingest operators (round-7
verdict ask #9): WET parsing and substring span dedup get the same
multi-size treatment the dedup/sketch families have.

Three studies, one JSON line each family:

1. **WET ingest growth** — synthetic .wet.gz shards at 3 record
   counts; time ``read_wet(...)`` forced end-to-end, and the full
   ``read_wet |> dedup_by_url`` front door. Pass bar: ~linear in
   records.
2. **WET shard parallelism** — the SAME record count as 1 gzip file
   vs 16: gzip is splittable per FILE, so the parallel unit is the
   shard (how Common Crawl ships ~100k files per crawl). Pass bar:
   sharded ≪ single-file.
3. **Span dedup** — one-shot ``duplicate_spans`` at 3 corpus sizes
   (corpus-growth slope), and ``incremental_duplicate_spans`` with a
   FIXED batch probed against stored indexes built from 3 corpus
   sizes (the O(batch) claim: probe time must stay ~flat while
   history grows 16x).

Usage: python tools/bench_corpus_ingest.py [--quick]
"""

from __future__ import annotations

import argparse
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from binancedatapipeline_spark.session import get_session
from binancedatapipeline_spark.textops.corpus_io import dedup_by_url, read_wet
from binancedatapipeline_spark.textops.spans import (
    duplicate_spans,
    incremental_duplicate_spans,
    span_index,
)


def _force(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def _wet_shards(root: str, n_records: int, n_shards: int) -> str:
    """Write n_records synthetic conversion records across n_shards
    .wet.gz files (~15 tokens of body each, 1-in-7 records URL-less,
    1-in-5 a duplicate URL refetch)."""
    d = os.path.join(root, f"wet_{n_records}_{n_shards}")
    os.makedirs(d, exist_ok=True)
    per = n_records // n_shards
    for s in range(n_shards):
        parts = []
        for i in range(s * per, (s + 1) * per):
            url = (
                ""
                if i % 7 == 0
                else f"WARC-Target-URI: https://site{i % 97}.example.com/p/{i % (n_records // 5)}\r\n"
            )
            body = " ".join(f"tok{(i * 31 + j) % 9973}" for j in range(15))
            parts.append(
                "WARC/1.0\r\n"
                "WARC-Type: conversion\r\n"
                f"{url}"
                f"WARC-Date: 2024-03-01T{i % 24:02d}:{i % 60:02d}:00Z\r\n"
                f"WARC-Record-ID: <urn:uuid:{i:012d}>\r\n"
                "\r\n"
                f"{body}\r\n\r\n"
            )
        with gzip.open(os.path.join(d, f"shard{s:03d}.wet.gz"), "wb") as f:
            f.write("".join(parts).encode())
    return d


def _span_corpus(spark, n: int, tokens: int = 200):
    """Distributed synthetic corpus: deterministic token stream, 1-in-20
    docs carry an 80-token shared passage (real work for span dedup)."""
    shared = " ".join(f"shared{i}" for i in range(80))
    body = F.expr(
        f"array_join(transform(sequence(1, {tokens}),"
        " i -> concat('w', pmod(hash(id, i), 50000))), ' ')"
    )
    text = F.when(
        (F.col("id") % 20) == 0, F.concat(F.lit(shared + " "), body)
    ).otherwise(body)
    return spark.range(n).select(F.col("id").alias("doc_id"), text.alias("text"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="4x smaller sizes")
    ap.add_argument("--workdir", default="/tmp/bench_corpus_ingest")
    args = ap.parse_args()
    spark = get_session(app_name="bench_corpus_ingest")
    div = 4 if args.quick else 1

    # ---- 1. WET ingest growth
    wet_sizes = [n // div for n in (5_000, 20_000, 80_000)]
    wet = {}
    for n in wet_sizes:
        d = _wet_shards(args.workdir, n, 8)
        parse = min(_force(read_wet(spark, d)) for _ in range(2))
        front = min(_force(dedup_by_url(read_wet(spark, d))) for _ in range(2))
        wet[n] = {"parse": round(parse, 3), "parse_dedup": round(front, 3)}
    print(json.dumps({"family": "wet_growth", "sec": wet}))

    # ---- 2. WET shard parallelism at the largest size
    n = wet_sizes[-1]
    single = _wet_shards(args.workdir, n, 1)
    many = _wet_shards(args.workdir, n, 16)
    par = {
        "1_shard": round(min(_force(read_wet(spark, single)) for _ in range(2)), 3),
        "16_shards": round(min(_force(read_wet(spark, many)) for _ in range(2)), 3),
    }
    print(json.dumps({"family": "wet_shard_parallelism", "records": n, "sec": par}))

    # ---- 3a. one-shot span dedup growth
    span_sizes = [n // div for n in (12_500, 50_000, 200_000)]
    oneshot = {}
    for n in span_sizes:
        df = _span_corpus(spark, n)
        oneshot[n] = round(_force(duplicate_spans(df, window=40)), 3)
    print(json.dumps({"family": "span_dedup_oneshot", "sec": oneshot}))

    # ---- 3b. incremental probe vs stored-index size (fixed batch)
    batch = _span_corpus(spark, 5_000 // div)
    probe = {}
    for n in [s * 2 for s in span_sizes]:
        idx_path = os.path.join(args.workdir, f"span_idx_{n}")
        span_index(_span_corpus(spark, n), window=40).write.mode(
            "overwrite"
        ).parquet(idx_path)  # index build excluded: it's the prior ingest
        idx = spark.read.parquet(idx_path)
        t0 = time.time()
        spans, new_rows = incremental_duplicate_spans(batch, idx, window=40)
        spans.write.format("noop").mode("overwrite").save()
        new_rows.write.format("noop").mode("overwrite").save()
        probe[n] = round(time.time() - t0, 3)
    print(
        json.dumps(
            {
                "family": "span_dedup_incremental_probe",
                "batch_docs": 5_000 // div,
                "sec_by_index_docs": probe,
            }
        )
    )


if __name__ == "__main__":
    main()
