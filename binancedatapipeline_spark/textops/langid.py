"""Trained character-n-gram language identification (Cavnar &
Trenkle 1994, "N-Gram-Based Text Categorization" — the classic
profile-ranking method behind most pre-neural language filters).

The curation pipeline's language stage in two halves, both
distributed and both pure DataFrame ops:

1. **Train** — per-language profiles: the ``top_k`` most frequent
   character n-grams of a labeled corpus, ranked. One explode + one
   (lang, gram) groupBy + one per-lang rank window; the profile
   relation is ≤ ``languages × top_k`` rows — broadcastable by
   construction, like every fitted table in this package (SQ/PQ
   codebooks, DSIR ratios, the unigram LM).
2. **Classify** — per-document out-of-place distance against every
   profile: explode the document's ranked grams, broadcast-join the
   profile table, sum ``|doc_rank − profile_rank|`` per (doc, lang)
   with a ``miss_penalty`` for grams absent from a profile, take the
   argmin. Two shuffles, both on doc keys (gram ranking + distance
   fold); the profile side never shuffles.

Scale shape at 100 TB: the corpus is touched once per half; nothing
ever materializes per-language corpora; the only joined relation is
the ≤ few-thousand-row profile dim (broadcast). Next to
:func:`textops.analysis.with_lang_guess` (the zero-fit stopword
heuristic, one scan, no shuffle): train this on labeled data when you
have it, fall back to the heuristic when you don't.

The reference pipeline has no language machinery; this extends the
training-data suite per the brief (langid is the first gate of
CCNet-style curation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_TOP_K = 300
DEFAULT_N = (2, 3)  # char bigrams + trigrams


def char_ngrams(col, n_values=DEFAULT_N):
    """The document's character n-gram array (lowercased, whitespace
    runs collapsed to one space, text padded with a leading/trailing
    space so word edges produce edge-grams — the Cavnar–Trenkle
    convention). ``sequence→transform`` per n: pure JVM expressions,
    no explode here, no shuffle. Short texts guard the descending-
    ``sequence(1, 0)`` trap with an explicit empty array."""
    # edge-trim BEFORE padding: whitespace-only (or empty) text must
    # yield NO grams — bare padding would otherwise manufacture a
    # "  " bigram and every such document would all-miss-tie to the
    # alphabetically first language instead of classifying to NULL
    base = F.regexp_replace(
        F.regexp_replace(F.lower(col), r"\s+", " "), r"^ | $", ""
    )
    c = F.concat(F.lit(" "), base, F.lit(" "))

    def one_n(n: int):
        # helper scope, not a loop-closure: F.transform dispatches on
        # the lambda's ARITY, so a `lambda i, _n=n` default-arg trick
        # would be mistaken for the (element, index) binary form
        return F.when(
            (F.length(base) > 0) & (F.length(c) >= n),
            F.transform(
                F.sequence(F.lit(1), F.length(c) - F.lit(n - 1)),
                lambda i: F.substring(c, i, n),
            ),
        ).otherwise(F.array().cast("array<string>"))

    parts = [one_n(n) for n in n_values]
    grams = parts[0]
    for p in parts[1:]:
        grams = F.concat(grams, p)
    return grams


def train_language_profiles(
    df: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    top_k: int = DEFAULT_TOP_K,
    n_values=DEFAULT_N,
) -> DataFrame:
    """``(lang, gram, rank)``: each language's ``top_k`` most frequent
    character n-grams, 1-ranked by count (gram string breaks ties, so
    training is deterministic under any row order). ≤ ``languages ×
    top_k`` rows — the broadcastable fit relation."""
    counts = (
        df.select(lang_col, F.explode(char_ngrams(F.col(text_col), n_values)).alias("gram"))
        .groupBy(lang_col, "gram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy(lang_col).orderBy(F.col("n").desc(), F.col("gram"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(F.col(lang_col).alias("lang"), "gram", "rank")
    )


def classify_language(
    df: DataFrame,
    profiles: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = DEFAULT_TOP_K,
    n_values=DEFAULT_N,
    miss_penalty: int | None = None,
    output_col: str = "lang_id",
) -> DataFrame:
    """Add ``output_col``: the language whose profile is nearest to
    the document's own ranked n-gram profile by out-of-place distance
    (``Σ |doc_rank − profile_rank|``, ``miss_penalty`` — default
    ``top_k`` — for document grams a profile lacks). NULL for
    documents that produce no n-grams. Deterministic: equal distances
    break toward the alphabetically first language.

    The document profile is capped at ``top_k`` grams like the
    training side (the method's own normalization — long documents
    must not out-vote the profile length)."""
    if miss_penalty is None:
        miss_penalty = top_k
    doc_w = Window.partitionBy(id_col).orderBy(F.col("n").desc(), F.col("gram"))
    doc_profile = (
        df.select(id_col, F.explode(char_ngrams(F.col(text_col), n_values)).alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("doc_rank", F.row_number().over(doc_w))
        .filter(F.col("doc_rank") <= top_k)
    )
    dist = (
        doc_profile
        # INNER join: only gram hits carry rank information. Doc grams
        # no profile contains contribute the flat miss penalty, which
        # is reconstructed below from (doc profile size − hits) — and
        # languages sharing no grams at all come back via the lang-dim
        # cross join, not this join
        .join(F.broadcast(profiles), "gram", "inner")
        .groupBy(id_col, "lang")
        .agg(
            F.sum(F.abs(F.col("doc_rank") - F.col("rank"))).alias("hit_dist"),
            F.count(F.lit(1)).alias("hits"),
        )
    )
    # grams with no profile entry cost miss_penalty each; the number
    # of misses is (doc profile size − hits), so the constant-per-doc
    # term needs the doc's gram count
    doc_sizes = doc_profile.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__doc_grams")
    )
    langs = profiles.select("lang").distinct()
    scored = (
        doc_sizes.crossJoin(F.broadcast(langs))
        .join(dist, [id_col, "lang"], "left")
        .select(
            id_col,
            "lang",
            (
                F.coalesce(F.col("hit_dist"), F.lit(0))
                + (F.col("__doc_grams") - F.coalesce(F.col("hits"), F.lit(0)))
                * F.lit(miss_penalty)
            ).alias("__dist"),
        )
    )
    best_w = Window.partitionBy(id_col).orderBy(F.col("__dist"), F.col("lang"))
    best = (
        scored.withColumn("__rn", F.row_number().over(best_w))
        .filter(F.col("__rn") == 1)
        .select(id_col, F.col("lang").alias(output_col), F.col("__dist").alias(f"{output_col}_dist"))
    )
    return df.join(best, id_col, "left")
