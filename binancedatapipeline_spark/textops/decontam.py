"""Benchmark decontamination: n-gram overlap against an eval corpus.

Training corpora must not contain the evaluation suites they will be
scored on, so pipelines strip every document sharing a word n-gram
with the benchmark set (the GPT-3 appendix-C / Pile-style 13-gram
rule, parameterized here).

Shape at 100 TB: the corpus side is huge, the benchmark side is tiny
(eval suites are a few MB). So the overlap test must never shuffle
the corpus on shingles — here the benchmark's distinct shingle-hash
set is broadcast and the corpus side stays a pure per-row projection
(tokenize → per-row-distinct shingle hashes → explode) probed through
a BroadcastHashJoin. The only corpus-keyed shuffle is the final
per-document hit count, and `decontaminate` skips even that by using
a broadcast LEFT ANTI join. A plan regression test pins the broadcast.

Shingles reuse the exact tokenizer/shingler from textops.dedup so
decontamination, MinHash and Jaccard all agree on what an n-gram is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from binancedatapipeline_spark.textops.analysis import tokens_col
from binancedatapipeline_spark.textops.dedup import _hash64x, _shingle_array


def _doc_shingle_hashes(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, sh_hash) with per-document-distinct shingle hashes.

    array_distinct runs inside the row (no shuffle) — the relation
    explodes distinct-per-doc, so downstream per-doc counts need no
    extra dedup."""
    return df.select(
        F.col(id_col), tokens_col(F.col(text_col)).alias("__toks")
    ).select(
        id_col,
        F.explode(
            F.transform(F.array_distinct(_shingle_array(n)), _hash64x)
        ).alias("sh_hash"),
    )


def benchmark_shingles(
    bench: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 5
) -> DataFrame:
    """The benchmark's distinct shingle-hash set — the broadcast side."""
    return (
        _doc_shingle_hashes(bench, id_col, text_col, n)
        .select("sh_hash")
        .distinct()
    )


def contamination_hits(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per contaminated document: (id, n_hits) where n_hits
    counts the distinct benchmark n-grams the document contains.

    Corpus-side plan: per-row shingle projection → broadcast hash
    probe → per-doc count. One corpus shuffle total (the count)."""
    doc_sh = _doc_shingle_hashes(docs, id_col, text_col, n)
    return (
        doc_sh.join(F.broadcast(benchmark_shingles(bench, id_col, text_col, n)), "sh_hash")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Documents with every benchmark-overlapping row removed.

    LEFT ANTI against the broadcast benchmark shingle set keyed on the
    document id — zero corpus shuffles: shingle projection, broadcast
    probe, and the anti filter all run map-side."""
    contaminated = (
        _doc_shingle_hashes(docs, id_col, text_col, n)
        .join(
            F.broadcast(benchmark_shingles(bench, id_col, text_col, n)),
            "sh_hash",
        )
        .select(id_col)
        .distinct()
    )
    return docs.join(F.broadcast(contaminated), id_col, "left_anti")
