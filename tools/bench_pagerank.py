"""PageRank scale curve: per-iteration wall vs edge count (the claim:
2 edge-sized exchanges per round, O(edges·iterations), lineage flat).

Usage: python tools/bench_pagerank.py [edge_counts_csv] [iterations]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from binancedatapipeline_spark.operators.pagerank import pagerank
from binancedatapipeline_spark.session import get_session


def _graph(spark, n_edges: int, n_nodes: int):
    # power-law-ish in-degree (hash-skewed dst), uniform src
    return spark.range(n_edges).select(
        F.pmod(F.xxhash64("id"), n_nodes).alias("src"),
        F.pmod(
            F.xxhash64("id", F.lit(1)),
            (F.pmod(F.xxhash64("id", F.lit(2)), 100) + 1) * (n_nodes // 100),
        ).alias("dst"),
    )


def main() -> None:
    counts = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "1000000,4000000,16000000").split(",")]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_session(app_name="bench_pagerank")
    pagerank(_graph(spark, 100_000, 10_000), iterations=2).count()  # warm
    for n in counts:
        g = _graph(spark, n, max(n // 20, 1000))
        t0 = time.perf_counter()
        out = pagerank(g, iterations=iters)
        rows = out.count()
        wall = time.perf_counter() - t0
        print(
            f"edges={n:>11,} iters={iters}  wall={wall:7.2f}s  "
            f"per-iter={wall / iters:6.2f}s  nodes={rows:,}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
