"""Distributed BPE tokenizer training — learn a byte-pair-encoding
merge list from the corpus itself, the way training-data pipelines
derive their tokenizer from the data they curate.

The classic observation (Sennrich et al. 2016; every practical BPE
trainer since) is that training never needs the token STREAM — only
the word-frequency table, which is orders of magnitude smaller than
the corpus. The Spark split follows that line exactly:

- ``word_counts``: the only corpus-scale stage — one explode + one
  map-side-combined groupBy. 100 TB of text reduces to a vocab-sized
  (word, count) relation here, and everything after operates on that.
- ``train_bpe``: iterative — each merge round is one weighted
  adjacent-pair aggregation over the vocab relation (explode bigrams
  carrying the word count, groupBy pair, global argmax) followed by a
  per-row merge rewrite. The argmax is ONE row collected per round
  (the merge decision is inherently global and sequential — that is
  BPE, not a Spark limitation); the rewrite is an Arrow-batched
  pandas UDF over the vocab relation. Lineage is truncated with
  ``localCheckpoint`` every round, the same discipline as
  operators/components.py (swap for ``checkpoint`` on a cluster).
- ``apply_bpe``: corpus-scale again but embarrassingly parallel — a
  pandas UDF closure over the frozen merge ranks, one map stage.

Determinism: pair-count ties break lexicographically on the pair, so
the merge list is a pure function of the corpus.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from binancedatapipeline_spark.operators.spread import spread
from binancedatapipeline_spark.textops.analysis import tokens_col

# marks end-of-word so merges never cross word boundaries; chosen from
# the Unicode private-use area to stay out of real text
EOW = "\ue000"


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) over whitespace tokens — the corpus-scale reduction
    every other stage runs on."""
    return (
        spread(df)
        .select(F.explode(tokens_col(F.col(text_col))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _merge_pair_udf(a: str, b: str):
    """Rewrite [..., a, b, ...] -> [..., a+b, ...] in symbol arrays."""
    merged = a + b

    @F.pandas_udf("array<string>")
    def merge(syms: pd.Series) -> pd.Series:
        def one(xs):
            out, i, n = [], 0, len(xs)
            while i < n:
                if i + 1 < n and xs[i] == a and xs[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(xs[i])
                    i += 1
            return out

        return syms.map(one)

    return merge


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 100,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns the
    ordered merge list [(a, b), ...]; stops early when no adjacent
    pair reaches ``min_pair_count`` (weighted by word frequency).

    Each round: one pair-count aggregation over the vocab relation +
    one argmax collect + one vectorized rewrite. Ties break on the
    lexicographically smallest pair for full determinism."""
    chars = F.expr("filter(split(word, ''), c -> c <> '')")
    vocab = word_counts(df, text_col).withColumn(
        "syms", F.concat(chars, F.array(F.lit(EOW)))
    ).select("syms", "n").localCheckpoint(eager=True)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        # fully-merged words (one symbol) have no pairs; they must be
        # excluded BEFORE the bigram transform — sequence(1, 0) is
        # descending in Spark, not empty
        pairs = vocab.filter(F.size("syms") >= 2).select(
            F.col("n"),
            F.explode(
                F.expr(
                    "transform(sequence(1, size(syms) - 1), "
                    "i -> struct(syms[i-1] as a, syms[i] as b))"
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_pair_count:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        vocab = vocab.select(
            _merge_pair_udf(a, b)(F.col("syms")).alias("syms"), "n"
        ).localCheckpoint(eager=True)
    return merges


def bpe_vocab(merges: list[tuple[str, str]]) -> list[str]:
    """The subword units the merge list produces (merge results in
    order; base characters are implicit)."""
    return [a + b for a, b in merges]


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    keep_eow: bool = False,
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge list — adds
    ``out_col`` (array of subword strings) and ``n_bpe_tokens``.
    Pure map stage: the merge ranks are a plain closure shipped with
    the task, applied per word by an Arrow-batched pandas UDF (the
    standard greedy lowest-rank-first BPE encode loop).

    ``keep_eow=False`` (default) strips the end-of-word marker for a
    human-readable, text-concatenation-lossless stream. Building a
    token→id table from :func:`bpe_vocab` (whose word-final units
    carry the marker, as trained) needs ``keep_eow=True`` — with the
    marker stripped, a word-final unit would conflate with the
    identical word-internal unit and lose the boundary distinction
    standard BPE preserves."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @F.pandas_udf("array<string>")
    def encode(texts: pd.Series) -> pd.Series:
        def enc_word(word: str) -> list[str]:
            syms = list(word) + [EOW]
            while len(syms) > 1:
                best, best_rank = None, None
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best, best_rank = i, r
                if best is None:
                    break
                syms[best : best + 2] = [syms[best] + syms[best + 1]]
            return syms

        def one(text) -> list[str]:
            out: list[str] = []
            for w in (text or "").split():
                units = enc_word(w)
                if not keep_eow:
                    units = [s.replace(EOW, "") for s in units]
                out.extend(units)
            return [s for s in out if s]

        return texts.map(one)

    return spread(df).withColumn(out_col, encode(F.col(text_col))).withColumn(
        "n_bpe_tokens", F.size(out_col)
    )
