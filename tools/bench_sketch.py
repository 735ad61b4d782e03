"""Scale evidence for the two compressed-state operators added in
round 5:

1. Bloom vs exact decontamination — probe wall time at growing CORPUS
   size against a fixed benchmark set, plus the state-size story
   (bitmap bytes vs exact hash-relation bytes). The probe cost should
   track the corpus (both are map-side); the win is state footprint,
   so the JSON reports both.

2. Count-Min vs exact n-gram counting — build wall time AND state
   rows at growing corpus size. Exact counting's state is one row per
   DISTINCT 5-gram (grows with the corpus, ~n_docs x tokens at these
   sizes); the sketch is pinned at depth x width rows no matter what.

Usage: python tools/bench_sketch.py [--sizes 50000,200000] [--reps 2]

Emits one JSON line:
{"sec": {"decontam_exact": {n: s}, "decontam_bloom": {n: s},
         "count_exact": {n: s}, "count_cms": {n: s}},
 "state": {"bloom_bitmap_bytes": b, "exact_relation_bytes_est": b,
           "cms_rows": r, "exact_distinct_5grams": {n: r}}}
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
from binancedatapipeline_spark.textops.decontam import (
    benchmark_shingles,
    bloom_decontaminate,
    build_bloom_bitmap,
    decontaminate,
)
from binancedatapipeline_spark.textops.sketch import cms_build


def corpus(spark: SparkSession, n_docs: int, tokens: int = 80, seed: int = 0) -> DataFrame:
    """Distinct synthetic docs; token stream non-linear in (id, j)."""
    ids = spark.range(0, n_docs, 1, 64)
    text = F.concat_ws(
        " ",
        F.expr(
            f"transform(sequence(1, {tokens}), "
            f"j -> concat('w', pmod(xxhash64(id + {seed}, j), 1000003)))"
        ),
    )
    return ids.select(F.col("id").alias("doc_id"), text.alias("text"))



def five_grams(c: DataFrame) -> DataFrame:
    """Word 5-grams via the SHARED tokenizer/shingler (textops.dedup
    _shingle_array over tokens_col), so the benchmark measures the
    same n-gram definition the operators use — not a private split()
    that could silently diverge."""
    from binancedatapipeline_spark.textops.analysis import tokens_col
    from binancedatapipeline_spark.textops.dedup import _shingle_array

    return c.select(tokens_col(F.col("text")).alias("__toks")).select(
        F.explode(_shingle_array(5)).alias("g")
    )


def _timed(build) -> float:
    t0 = time.perf_counter()
    build().write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="50000,200000")
    ap.add_argument("--bench-docs", type=int, default=2000)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    spark = get_session(app_name="bench_sketch")
    bench = corpus(spark, args.bench_docs, seed=10_000_000).persist()
    bench.count()
    bitmap = build_bloom_bitmap(bench)  # built once, reused (the API's point)

    sec: dict[str, dict[str, float]] = {
        "decontam_exact": {}, "decontam_bloom": {},
        "count_exact": {}, "count_cms": {},
    }
    legs = []
    for n in sizes:
        legs += [("decontam_exact", n), ("decontam_bloom", n),
                 ("count_exact", n), ("count_cms", n)]

    def run(mode: str, n: int) -> float:
        c = corpus(spark, n)
        if mode == "decontam_exact":
            return _timed(lambda: decontaminate(c, bench))
        if mode == "decontam_bloom":
            return _timed(lambda: bloom_decontaminate(c, bitmap=bitmap))
        grams = five_grams(c)
        if mode == "count_exact":
            return _timed(lambda: grams.groupBy("g").count())
        return _timed(lambda: cms_build(grams, "g", depth=5, width=65536))

    for _ in range(args.reps):
        for mode, n in legs:
            t = run(mode, n)
            key = str(n)
            prev = sec[mode].get(key)
            sec[mode][key] = t if prev is None else min(prev, t)
            print(f"  {mode} n={n}: {t:.2f}s", file=sys.stderr, flush=True)

    n_bench_shingles = benchmark_shingles(bench).count()
    distinct = {}
    for n in sizes:
        c = corpus(spark, n)
        distinct[str(n)] = (
            five_grams(c)
            .agg(F.approx_count_distinct("g").alias("d"))
            .collect()[0]["d"]
        )
    state = {
        "bloom_bitmap_bytes": len(bitmap[0]) * 8,
        "exact_relation_bytes_est": n_bench_shingles * 40,  # 8B hash + ~32B HashedRelation overhead
        "bench_distinct_shingles": n_bench_shingles,
        "cms_rows": 5 * 65536,
        "exact_distinct_5grams": distinct,
    }
    print(json.dumps({"sec": sec, "state": state}))


if __name__ == "__main__":
    main()
