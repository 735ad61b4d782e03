"""Scaling evidence for the training-data ops: dedup / decontam /
split at growing corpus sizes.

The per-round bench (bench.py) runs the text ops at sf0.1 (5k docs)
where fixed overhead dominates; this tool measures how the same
operators scale over Spark-generated corpora 2–50× larger. Documents
are deterministic token sequences (no driver-side pandas, generation
is distributed); ~6% of documents are exact copies of their
predecessor so dedup/LSH have real work to find.

Pass bars:
- map-only ops (minhash, simhash, split) scale ~linearly in docs;
- exact dedup and LSH candidate pairs scale ~linearly too (both are
  bucketed equi-joins, never all-pairs);
- decontamination stays ~linear with the corpus while the benchmark
  side stays broadcast.

Emits one JSON line: {"sizes": [...], "sec": {op: {size: s}},
"linear_ratio": {op: r}} where linear_ratio ~ 1.0 means the op's
wall time grew no faster than the corpus.

Usage: python tools/bench_textops.py [--sizes 10000,50000,250000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binancedatapipeline_spark.session import get_session
from binancedatapipeline_spark.textops.decontam import contamination_hits
from binancedatapipeline_spark.textops.dedup import (
    exact_duplicates,
    lsh_candidate_pairs,
    minhash_signatures,
    near_dedup,
    simhash,
)
from binancedatapipeline_spark.textops.lm import score_documents, unigram_model
from binancedatapipeline_spark.textops.packing import chunk_documents
from binancedatapipeline_spark.textops.sampling import stable_split
from binancedatapipeline_spark.textops.cleaning import (
    gopher_filter,
    ngram_repetition,
    redact_pii,
)
from binancedatapipeline_spark.textops.curate import curate


def gen_corpus(
    spark: SparkSession, n_docs: int, tokens: int = 120, start: int = 0
) -> DataFrame:
    """Deterministic corpus: doc i is 120 tokens hashed from (seed, j)
    into a ~1M-word space; every 17th document is an exact copy of its
    predecessor (~6% dup rate). ``start`` offsets the id range —
    because text derives from the ACTUAL id, two corpora over disjoint
    id ranges share no content (an earlier incremental-dedup bench
    shifted ids AFTER generation, which silently made the batch 100%
    copies of history).

    The token function must be NON-LINEAR in (seed, position): two
    earlier linear variants (token = seed*A + j*B mod p, for any
    modulus) made cross-doc shingle overlap a coset property — one
    colliding (seed_delta, offset) aligns an entire arithmetic
    progression, so *whole shingle runs* match between unrelated docs
    (at 250k docs the %1000003 stride produced ~7.4M accidentally
    co-shingled doc pairs ≈ 800M join rows — a quadratic corpus, not a
    quadratic operator). xxhash64(seed, j) breaks the progression:
    distinct docs now collide per-token at ~1e-6 and per-3-shingle at
    ~1e-18 — effectively never."""
    ids = spark.range(start, start + n_docs, 1, 64)
    seed = F.when(
        (F.col("id") % 17 == 0) & (F.col("id") > start), F.col("id") - 1
    ).otherwise(F.col("id"))
    text = F.concat_ws(
        " ",
        F.expr(
            f"transform(sequence(1, {tokens}), "
            f"j -> concat('w', pmod(xxhash64(__seed, j), 1000003)))"
        ),
    )
    return ids.withColumn("__seed", seed).select(
        F.col("id").alias("doc_id"), text.alias("text")
    )


def messy(docs: DataFrame) -> DataFrame:
    """Decorate the corpus so the cleaning ops have real work: every
    7th doc gains a PII line (email + phone), every 5th a boilerplate
    line, and the body splits into ~6 lines."""
    lines = F.regexp_replace(F.col("text"), r"((?:\S+ ){19}\S+) ", "$1\n")
    text = F.col("__lined")
    text = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(text, F.lit("\nContact me at user"), F.col("doc_id"),
                 F.lit("@example.com or (555) 123-4567 today.")),
    ).otherwise(text)
    text = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(text, F.lit("\nall rights reserved click here")),
    ).otherwise(text)
    return docs.withColumn("__lined", lines).select(
        "doc_id", text.alias("text")
    )


def _noop(build) -> float:
    # the builder runs INSIDE the timer: ops like near_dedup execute
    # eager driver-side actions (per-round convergence checks) during
    # plan construction, which must be charged to the op
    t0 = time.perf_counter()
    build().write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="10000,50000,250000")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    spark = get_session(app_name="bench_textops")
    sec: dict[str, dict[str, float]] = {}

    for n in sizes:
        docs = gen_corpus(spark, n).persist()
        docs.count()  # materialize once so every op times only itself
        bench = docs.filter(F.col("doc_id") % 100 == 0)  # 1% "eval set"

        ops = {
            "minhash": lambda d=docs: minhash_signatures(d, k=16),
            "simhash": lambda d=docs: simhash(d),
            "exact_dedup": lambda d=docs: exact_duplicates(d),
            "lsh_pairs": lambda d=docs: lsh_candidate_pairs(d, k=16, bands=8),
            "decontaminate": lambda d=docs, b=bench: contamination_hits(d, b, n=5),
            "stable_split": lambda d=docs: stable_split(d, "doc_id")
            .groupBy("split")
            .count(),
            # cleaning/curation over the decorated (multi-line, PII,
            # boilerplate) variant so the filters have real work
            "redact_pii": lambda d=docs: redact_pii(messy(d)),
            "gopher_filter": lambda d=docs: gopher_filter(messy(d)),
            "ngram_repetition": lambda d=docs: ngram_repetition(messy(d), n=2),
            "curate_full": lambda d=docs, b=bench: curate(
                messy(d), b, min_line_words=1, gopher_overrides={"min_words": 5}
            ),
            # the full cluster-resolution chain: LSH pairs -> connected
            # components (iterative, eager per-round checks) -> survivors
            "near_dedup_chain": lambda d=docs: near_dedup(d, k=16, bands=8),
            # unigram fit (capped vocab) + broadcast scoring join
            "unigram_score": lambda d=docs: score_documents(
                d, unigram_model(d, vocab_size=50000)
            ),
            # overlapping context-window chunking (pure map)
            "chunk_docs": lambda d=docs: chunk_documents(
                d, max_tokens=48, overlap=8
            ),
        }
        # round-robin repeats with per-op min, exactly like bench.py:
        # the host shows multi-minute co-tenant bursts that poison any
        # single-shot long measurement (a burst once turned the 9s
        # curation chain into a recorded 257s); interleaving puts a
        # burst on one PASS, absorbed by the min
        reps = max(int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")), 1)
        samples: dict[str, list[float]] = {name: [] for name in ops}
        for _ in range(reps):
            for name, build in ops.items():
                samples[name].append(_noop(build))
                # curate persists its cleaned corpus internally — drop
                # every cached intermediate so later repeats pay full
                # cost, then restore the corpus cache (untimed)
                spark.catalog.clearCache()
                docs.persist()
                docs.count()
        for name, runs in samples.items():
            sec.setdefault(name, {})[str(n)] = round(min(runs), 2)
        docs.unpersist()

    lo, hi = str(min(sizes)), str(max(sizes))
    scale = max(sizes) / min(sizes)
    out = {
        "sizes": sizes,
        "sec": sec,
        # wall-time growth / corpus growth; ~1.0 = linear, <1 = sub-linear
        "linear_ratio": {
            name: round((t[hi] / max(t[lo], 1e-9)) / scale, 2)
            for name, t in sec.items()
        },
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
