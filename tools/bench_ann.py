"""Scaling evidence for the similarity-search suite: exact cosine,
multi-probe LSH, IVF, PQ-ADC and IVF-PQ over Spark-generated embedding
corpora of growing size.

Vectors are deterministic unit vectors built entirely with column
expressions (xxhash64-seeded components — no driver-side numpy for
the corpus, so generation distributes); one fixed 8-query batch probes
every strategy at every size. Pass bars:

- exact cosine grows ~linearly in corpus size (it is one scan);
- the index strategies (LSH probe, IVF, IVF-PQ) grow SUB-linearly in
  wall time because their candidate scans are bucket-pruned;
- PQ-ADC stays scan-shaped but cheap (m table lookups per row vs a
  dim-length float dot product).

Recall@10 vs the exact baseline is reported per strategy — a speed
number without its recall is meaningless for ANN.

Emits one JSON line:
  {"sizes": [...], "dim": D,
   "sec": {strategy: {size: s}}, "recall": {strategy: {size: r}}}

Usage: python tools/bench_ann.py [--sizes 50000,200000,800000]
       [--dim 64] [--queries 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from binancedatapipeline_spark.session import get_session
from binancedatapipeline_spark.similarity import (
    cosine_topk,
    ivf_topk,
    ivfpq_topk,
    lsh_bucketed_topk,
    pq_encode,
    pq_topk_rerank,
    train_ivf_centroids,
    train_pq_codebooks,
)


def gen_embeddings(
    spark: SparkSession, n: int, dim: int, n_clusters: int | None = None
) -> DataFrame:
    """Deterministic CLUSTERED unit vectors: vector i = 3·center(i mod
    n_clusters) + 0.5·noise(i), every component an xxhash64-derived
    ~uniform-sum pseudo-gaussian. Uniform (structure-free) corpora
    make ANN recall meaningless — every neighbor is near-orthogonal
    with vanishing cosine gaps, so no index can beat chance; real
    embedding corpora are clustered, and the cluster structure is what
    the IVF/LSH/PQ strategies exploit. ``n_clusters`` defaults to
    n/312 (fixed ~312-member clusters): with a FIXED cluster count,
    growing the corpus grows every cluster, making top-10 intrinsically
    harder at larger n — recall curves would measure the corpus, not
    the index."""
    if n_clusters is None:
        n_clusters = max(64, n // 312)
    ids = spark.range(0, n, 1, 64)
    g = (
        lambda *keys: f"(cast(pmod(xxhash64({', '.join(keys)}), 100000) as double) / 50000.0 - 1.0)"
        f" + (cast(pmod(xxhash64({', '.join(keys)}, 7), 100000) as double) / 50000.0 - 1.0)"
    )
    raw = F.expr(
        f"transform(sequence(1, {dim}), j -> "
        f"3.0 * ({g(f'id % {n_clusters}', 'j')}) + 0.5 * ({g('id', 'j', '13')}))"
    )
    norm = F.expr(
        "sqrt(aggregate(__raw, cast(0.0 as double), (a, v) -> a + v * v))"
    )
    return (
        ids.withColumn("__raw", raw)
        .withColumn("__n", norm)
        .select(
            F.col("id").alias("vec_id"),
            F.expr("transform(__raw, v -> cast(v / __n as float))").alias("embedding"),
        )
    )


def _timed(build) -> float:
    t0 = time.perf_counter()
    build().write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def _sets(df: DataFrame) -> dict[int, set]:
    out: dict[int, set] = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


def _recall(exact_sets: dict[int, set], approx: DataFrame, k: int) -> float:
    ap = _sets(approx)
    vals = [len(exact_sets[q] & ap.get(q, set())) / k for q in exact_sets]
    return round(sum(vals) / len(vals), 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="50000,200000,800000")
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--queries", type=int, default=8)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    spark = get_session(app_name="bench_ann")
    sec: dict[str, dict[str, float]] = {}
    recall: dict[str, dict[str, float]] = {}

    for n in sizes:
        corpus = gen_embeddings(spark, n, args.dim).persist()
        corpus.count()
        # queries: perturbed copies of spread-out corpus vectors
        src = corpus.filter(
            F.col("vec_id").isin([int(i * n / args.queries) for i in range(args.queries)])
        ).collect()
        qrows = []
        rng = np.random.default_rng(3)
        for qi, r in enumerate(src):
            v = np.array(r["embedding"]) + rng.standard_normal(args.dim) * 0.02
            v /= np.linalg.norm(v)
            qrows.append((qi, [float(x) for x in v]))
        queries = spark.createDataFrame(qrows, "query_id long, query_vec array<float>")

        exact = cosine_topk(corpus, queries, k=args.k)
        exact_sets = _sets(exact)  # collected ONCE; doubles as codegen warmup
        n_cells = max(64, n // 1500)  # cells track corpus size (std IVF sizing)
        strategies = {
            "exact_cosine": lambda: cosine_topk(corpus, queries, k=args.k),
            "lsh_probe": lambda: lsh_bucketed_topk(
                corpus, queries, k=args.k, n_planes=16, max_hamming=3, dim=args.dim
            ),
        }
        cent = train_ivf_centroids(corpus, n_cells=n_cells, sample_rows=20000)
        strategies["ivf"] = lambda: ivf_topk(
            corpus, queries, k=args.k, n_cells=n_cells, nprobe=8, centroids=cent
        )
        cb = train_pq_codebooks(corpus, m=16, n_codes=256, sample_rows=20000)
        enc = pq_encode(corpus, cb).persist()
        enc.count()
        strategies["pq_adc_rerank"] = lambda: pq_topk_rerank(
            enc, corpus, queries, cb, k=args.k, shortlist_factor=8
        )
        from binancedatapipeline_spark.similarity import (
            ivfpq_encode,
            train_pq_codebooks_residual,
        )

        rcb = train_pq_codebooks_residual(
            corpus, cent, m=16, n_codes=256, sample_rows=20000
        )
        # index build measured separately; queries reuse the persisted index
        t0 = time.perf_counter()
        ivf_enc = ivfpq_encode(corpus, cent, rcb).persist()
        ivf_enc.count()
        sec.setdefault("ivfpq_build", {})[str(n)] = round(time.perf_counter() - t0, 2)
        strategies["ivfpq_residual"] = lambda: ivfpq_topk(
            corpus, queries, k=args.k, n_cells=n_cells, nprobe=8, m=16, n_codes=256,
            centroids=cent, codebooks=rcb, encoded=ivf_enc, shortlist_factor=8,
        )

        # round 6: OPQ-rotated residual codebooks (Ge et al. 2013),
        # measured next to the plain residual row so the rotation's
        # recall delta is a direct A/B at every corpus size
        from binancedatapipeline_spark.similarity import train_opq_rotation_residual

        rot, ocb = train_opq_rotation_residual(
            corpus, cent, m=16, n_codes=256, sample_rows=20000
        )
        t0 = time.perf_counter()
        opq_enc = ivfpq_encode(corpus, cent, ocb, rotation=rot).persist()
        opq_enc.count()
        sec.setdefault("ivfpq_opq_build", {})[str(n)] = round(time.perf_counter() - t0, 2)
        strategies["ivfpq_opq"] = lambda: ivfpq_topk(
            corpus, queries, k=args.k, n_cells=n_cells, nprobe=8, m=16, n_codes=256,
            centroids=cent, codebooks=ocb, encoded=opq_enc, rotation=rot,
            shortlist_factor=8,
        )

        # round 6: SQ8 scalar quantization — the JVM-only compressed
        # scan (1 byte/dim, decode-on-the-fly into the exact plan)
        from binancedatapipeline_spark.similarity import (
            sq_encode,
            sq_topk,
            train_sq_params,
        )

        sq_params = train_sq_params(corpus)
        t0 = time.perf_counter()
        sq_enc = sq_encode(corpus, sq_params).drop("embedding").persist()
        sq_enc.count()
        sec.setdefault("sq8_build", {})[str(n)] = round(time.perf_counter() - t0, 2)
        strategies["sq8_scan"] = lambda: sq_topk(
            sq_enc, queries, sq_params, k=args.k
        )

        for name, build in strategies.items():
            best = min(_timed(build) for _ in range(2))
            sec.setdefault(name, {})[str(n)] = round(best, 2)
            r = 1.0 if name == "exact_cosine" else _recall(exact_sets, build(), args.k)
            recall.setdefault(name, {})[str(n)] = r
            print(f"  n={n} {name}: {best:.2f}s recall={r}", file=sys.stderr, flush=True)
        enc.unpersist()
        ivf_enc.unpersist()
        opq_enc.unpersist()
        sq_enc.unpersist()
        corpus.unpersist()

    print(json.dumps({"sizes": sizes, "dim": args.dim, "sec": sec, "recall": recall}))


if __name__ == "__main__":
    main()
