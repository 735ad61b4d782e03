"""Substring-level duplicate-span removal — the sequence-level
complement to document-level dedup (the public method: Lee et al.
2021, "Deduplicating Training Data Makes Language Models Better",
which removes every repeated ≥50-token span; they build suffix
arrays offline, we express the same contract relationally).

Pipeline shape, and the 100 TB accounting:

1. **Window hashes** — per document, one 64-bit hash per token
   window of length ``window`` (per-row JVM ``transform``; no
   explode yet). O(tokens × window) character work, all inside
   codegen.
2. **Find repeats** — posexplode to (doc, pos, h), count occurrences
   per h. The shuffle carries (hash, count) partials — map-side
   combined, digest-only, no text moves.
3. **Keep-first exemption** — the canonical occurrence of each
   repeated hash (min (doc, pos)) is NOT removed, so shared passages
   survive exactly once in the corpus instead of vanishing from it;
   every other occurrence becomes a removal span.
4. **Merge + cut** — per document, overlapping removal windows merge
   into maximal spans (one LAG window over the doc's own spans), and
   the tokens they cover are dropped by a per-row array filter.

Only hashes and positions ever shuffle; document text stays columnar
in place until the final per-row rewrite. Matches are 64-bit-hash
equality, not byte equality — a collision (≈2⁻⁶⁴ per window pair)
removes a non-duplicate span; at training-data scale this is the
standard accepted trade (MinHash/LSH pipelines make the same one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from binancedatapipeline_spark.operators.spread import spread
from binancedatapipeline_spark.textops.analysis import tokens_col

SPAN_SEED = 6151  # fixed odd prime, same discipline as dsir/minhash


def _window_hash_array(window: int, toks_col: str = "__toks") -> F.Column:
    """Per-row array of window hashes: element i (0-based) hashes
    tokens [i+1, i+window] (1-based slice). Documents shorter than
    ``window`` produce an empty array — too short to participate.
    (The empty case needs an explicit branch: ``sequence(1, 0)``
    DESCENDS in Spark rather than yielding an empty sequence.)"""
    return F.expr(
        f"case when size({toks_col}) < {window} then array() "
        f"else transform(sequence(1, size({toks_col}) - {window - 1}), "
        f"i -> xxhash64(concat_ws(' ', slice({toks_col}, i, {window})), {SPAN_SEED})) end"
    )


def duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 50,
    keep_first: bool = True,
) -> DataFrame:
    """(id, span_start, span_end): maximal 1-based token spans covered
    by windows whose hash repeats anywhere in the corpus (across OR
    within documents). With ``keep_first`` the lexicographically-first
    occurrence (min (doc id, position) per hash) is exempt — dedup
    keeps one copy of the passage, it does not erase it from the
    corpus."""
    toks = tokens_col(F.col(text_col))
    occ = (
        spread(df.select(id_col, text_col))
        .withColumn("__toks", toks)
        .select(
            id_col, F.posexplode(_window_hash_array(window)).alias("pos0", "h")
        )
        .withColumn("pos", F.col("pos0") + 1)
        .drop("pos0")
    )
    counts = occ.groupBy("h").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("first_occ"),
    )
    dup = occ.join(counts.filter(F.col("n") >= 2), "h")
    if keep_first:
        dup = dup.filter(
            ~(
                (F.col(id_col) == F.col("first_occ")[id_col])
                & (F.col("pos") == F.col("first_occ")["pos"])
            )
        )
    # merge overlapping/adjacent windows into maximal spans: windows
    # at pos p, p' overlap when p' − p < window (they share tokens);
    # the classic gaps-and-islands LAG over each doc's own positions
    w = Window.partitionBy(id_col).orderBy("pos")
    islands = (
        dup.select(id_col, "pos")
        .distinct()
        .withColumn("__prev", F.lag("pos").over(w))
        .withColumn(
            "__new",
            (F.col("__prev").isNull() | (F.col("pos") - F.col("__prev") > window))
            .cast("int"),
        )
        .withColumn("__grp", F.sum("__new").over(w))
    )
    return islands.groupBy(id_col, "__grp").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + window - 1).alias("span_end"),
    ).drop("__grp")


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 50,
    keep_first: bool = True,
    output_col: str | None = None,
) -> DataFrame:
    """Rewrite ``text_col`` (or ``output_col``) with every duplicate
    span's tokens removed — one left join of the span sets back onto
    the corpus, then a per-row array filter; documents with no
    repeated spans pass through byte-identical."""
    out_col = output_col or text_col
    spans = (
        duplicate_spans(df, id_col, text_col, window, keep_first)
        .groupBy(id_col)
        .agg(
            F.collect_list(F.struct("span_start", "span_end")).alias("__spans")
        )
    )
    toks = tokens_col(F.col(text_col))
    kept = F.filter(
        F.transform(toks, lambda t, i: F.struct(t.alias("t"), (i + 1).alias("i"))),
        lambda s: ~F.exists(
            F.col("__spans"),
            lambda sp: (s["i"] >= sp["span_start"]) & (s["i"] <= sp["span_end"]),
        ),
    )
    cleaned = F.array_join(F.transform(kept, lambda s: s["t"]), " ")
    return (
        df.join(spans, id_col, "left")
        .withColumn(
            out_col,
            F.when(F.col("__spans").isNull(), F.col(text_col)).otherwise(cleaned),
        )
        .drop("__spans")
    )
