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


def _padded(col) -> F.Column:
    """Lowercase, collapse whitespace runs to one space, edge-trim,
    then pad with one leading/trailing space (the Cavnar–Trenkle
    convention: word edges produce edge-grams). Edge-trim BEFORE
    padding so whitespace-only/empty text becomes exactly ``"  "``
    (detectable: no grams) — bare padding would manufacture a ``"  "``
    bigram and every such document would all-miss-tie to the
    alphabetically first language instead of classifying to NULL."""
    base = F.regexp_replace(
        F.regexp_replace(F.lower(col), r"\s+", " "), r"^ | $", ""
    )
    return F.concat(F.lit(" "), base, F.lit(" "))


def _grams_from_padded(padded, n_values=DEFAULT_N) -> F.Column:
    """N-gram array from an ALREADY-BOUND padded-text column.

    ``padded`` must be a materialized column attribute (a
    ``withColumn`` output), not an inline expression tree: Spark's
    higher-order functions are interpreted, so every subexpression
    inside the lambda body is re-evaluated PER ELEMENT — an inline
    lowercase/regex-collapse chain here turns gram extraction into
    O(len²) regex passes per document (measured: a 1000-doc × 2 KB
    classify ran minutes instead of seconds before this split).
    Short/empty texts guard the descending-``sequence(1, 0)`` trap
    with an explicit empty array; padded == "  " (empty source) yields
    no grams."""

    def one_n(n: int):
        # helper scope, not a loop-closure: F.transform dispatches on
        # the lambda's ARITY, so a `lambda i, _n=n` default-arg trick
        # would be mistaken for the (element, index) binary form
        return F.when(
            (F.length(padded) > 2) & (F.length(padded) >= n),
            F.transform(
                F.sequence(F.lit(1), F.length(padded) - F.lit(n - 1)),
                lambda i: F.substring(padded, i, n),
            ),
        ).otherwise(F.array().cast("array<string>"))

    parts = [one_n(n) for n in n_values]
    grams = parts[0]
    for p in parts[1:]:
        grams = F.concat(grams, p)
    return grams


def char_ngrams(col, n_values=DEFAULT_N):
    """The document's character n-gram array (lowercased, whitespace
    runs collapsed to one space, text padded with a leading/trailing
    space so word edges produce edge-grams — the Cavnar–Trenkle
    convention). Pure JVM expressions, no explode here, no shuffle.

    NOTE: convenience form for ad-hoc use on short strings — it
    inlines the normalization INSIDE the per-element lambda, which
    interpreted higher-order functions re-evaluate per gram (O(len²)).
    The train/classify pipeline binds the padded text once with
    ``withColumn`` and uses :func:`_grams_from_padded` instead."""
    return _grams_from_padded(_padded(col), n_values)


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
        # bind the padded text ONCE per row (see _grams_from_padded:
        # an inline expression would be re-evaluated per gram)
        df.withColumn("__cn", _padded(F.col(text_col)))
        .select(lang_col, F.explode(_grams_from_padded(F.col("__cn"), n_values)).alias("gram"))
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
    max_chars: int | None = 4000,
) -> DataFrame:
    """Add ``output_col``: the language whose profile is nearest to
    the document's own ranked n-gram profile by out-of-place distance
    (``Σ |doc_rank − profile_rank|``, ``miss_penalty`` — default
    ``top_k`` — for document grams a profile lacks). NULL for
    documents that produce no n-grams. Deterministic: equal distances
    break toward the alphabetically first language.

    The document profile is capped at ``top_k`` grams like the
    training side (the method's own normalization — long documents
    must not out-vote the profile length), and ``max_chars`` bounds
    the gram extraction to the document HEAD (the CCNet deployment —
    language rarely changes mid-page, and 4k characters carry far
    more than ``top_k`` distinct grams): the per-document explode
    cost is a constant, not a function of document length, which is
    the difference between a bounded and an unbounded shuffle at
    100 TB. ``max_chars=None`` reads everything."""
    if miss_penalty is None:
        miss_penalty = top_k
    text = F.col(text_col)
    if max_chars is not None:
        text = F.substring(text, 1, max_chars)
    doc_w = Window.partitionBy(id_col).orderBy(F.col("n").desc(), F.col("gram"))
    doc_profile = (
        # bind the padded text ONCE per row (see _grams_from_padded)
        df.withColumn("__cn", _padded(text))
        .select(id_col, F.explode(_grams_from_padded(F.col("__cn"), n_values)).alias("gram"))
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
