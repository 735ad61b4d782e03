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
    if "--warm" in sys.argv:
        # warm-start study: rank a graph cold (tol-stopped), perturb
        # 2% of edges (the monthly-recrawl delta), re-rank cold vs
        # warm-started from the previous answer — rounds and wall
        sys.argv.remove("--warm")
        n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
        # tol is an ABSOLUTE L-inf bound, so it must scale with rank
        # magnitude (~1/nodes): at 200k nodes a 1e-6 tol is satisfied
        # in ~4 rounds; 1e-8 is the meaningful convergence regime
        tol = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-8
        spark = get_session(app_name="bench_pagerank")
        g_old = _graph(spark, n, max(n // 20, 1000))
        g_new = g_old.unionByName(_graph(spark, n // 50, max(n // 20, 1000)))
        prev = pagerank(g_old, iterations=50, tol=tol)
        for label, kw in (("cold", {}), ("warm", {"init_ranks": prev})):
            rounds = []
            t0 = time.perf_counter()
            out = pagerank(
                g_new, iterations=50, tol=tol,
                on_iteration=lambda i, d: rounds.append(d), **kw,
            )
            nodes = out.count()
            print(
                f"{label}: rounds={len(rounds)}  wall={time.perf_counter()-t0:7.2f}s"
                f"  final_delta={rounds[-1]:.2e}  nodes={nodes:,}"
            )
        spark.stop()
        return

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
