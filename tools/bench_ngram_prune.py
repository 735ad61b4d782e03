"""Settle the ngram_jaccard singleton-prune question with numbers.

Round 2 shipped a count-over-window singleton prefilter; round 3
removed it with a plausibility argument (textops/dedup.py docstring).
This tool measures the three candidate shapes head-to-head at a scale
where fixed overhead amortizes (default 250k docs, the bench_textops
ceiling), on a singleton-dominated corpus (distinct docs share no
shingles by construction; ~6% exact copies supply the co-shingled
mass — the realistic web-crawl shape where most shingles are unique):

- no_prune      : the shipped shape — explode once, ReusedExchange
                  self-join, pair-agg. Singletons cost one O(1)
                  self-match each in the sorted merge.
- window_prune  : round-2 shape — count() over Window(sh_hash),
                  filter >= 2, then self-join. One extra full pass
                  over the sorted exploded relation.
- agg_semi_prune: groupBy(sh_hash).count() >= 2 → left-semi join.
                  The aggregate subtree no longer shares an exchange
                  with the probe side, so the tokenize kernel runs in
                  a second subtree (unless persisted).

Emits one JSON line: {"n_docs": N, "sec": {variant: [run1, run2, ...]},
"best": {variant: s}, "pairs": {variant: rows}} — pair counts must be
identical across variants (a correctness cross-check for free).

Usage: python tools/bench_ngram_prune.py [--docs 250000] [--repeats 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from binancedatapipeline_spark.session import get_session
from binancedatapipeline_spark.textops.analysis import tokens_col
from binancedatapipeline_spark.textops.dedup import _hash56, _shingle_array
from binancedatapipeline_spark.operators.spread import spread
from tools.bench_textops import gen_corpus


def _shared(df: DataFrame, n: int = 3) -> DataFrame:
    """The exploded (doc_id, __n, sh_hash) inverted index — identical
    front end for every variant (mirrors ngram_jaccard_pairs)."""
    toks = tokens_col(F.col("text"))
    doc = spread(df).select(F.col("doc_id"), toks.alias("__toks")).select(
        "doc_id",
        F.transform(F.array_distinct(_shingle_array(n)), _hash56).alias("__hs"),
    )
    return doc.select(
        F.col("doc_id"),
        F.size("__hs").alias("__n"),
        F.explode("__hs").alias("sh_hash"),
    )


def _pairs(shared: DataFrame) -> DataFrame:
    a = shared.select(
        F.col("doc_id").alias("id_a"), F.col("__n").alias("n_a"), "sh_hash"
    )
    b = shared.select(
        F.col("doc_id").alias("id_b"), F.col("__n").alias("n_b"), "sh_hash"
    )
    return (
        a.join(b, "sh_hash")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
    )


def no_prune(df: DataFrame) -> DataFrame:
    return _pairs(_shared(df))


def window_prune(df: DataFrame) -> DataFrame:
    shared = _shared(df)
    shared = (
        shared.withColumn(
            "__c", F.count(F.lit(1)).over(Window.partitionBy("sh_hash"))
        )
        .filter(F.col("__c") >= 2)
        .drop("__c")
    )
    return _pairs(shared)


def agg_semi_prune(df: DataFrame) -> DataFrame:
    shared = _shared(df)
    multi = (
        shared.groupBy("sh_hash")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= 2)
        .select("sh_hash")
    )
    return _pairs(shared.join(multi, "sh_hash", "left_semi"))


VARIANTS = {
    "no_prune": no_prune,
    "window_prune": window_prune,
    "agg_semi_prune": agg_semi_prune,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=250_000)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    spark = get_session(app_name="bench_ngram_prune")
    docs = gen_corpus(spark, args.docs).persist()
    docs.count()

    sec: dict[str, list[float]] = {name: [] for name in VARIANTS}
    pairs: dict[str, int] = {}
    # round-robin passes (same rationale as bench.py): a load burst
    # poisons one pass, not one variant's every sample. No clearCache:
    # the only persisted relation is the shared corpus, deliberately
    # kept warm so the variants' own work is what's timed.
    for _ in range(args.repeats):
        for name, build in VARIANTS.items():
            t0 = time.perf_counter()
            build(docs).write.format("noop").mode("overwrite").save()
            sec[name].append(round(time.perf_counter() - t0, 2))
    for name, build in VARIANTS.items():
        pairs[name] = build(docs).count()

    print(json.dumps({
        "n_docs": args.docs,
        "sec": sec,
        "best": {name: min(runs) for name, runs in sec.items()},
        "pairs": pairs,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
