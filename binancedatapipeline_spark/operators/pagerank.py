"""Distributed PageRank over a link graph — the host-authority signal
web-curation pipelines weight documents by (Common Crawl publishes
exactly this as its host-level ranks; CCNet/RefinedWeb-style recipes
consume link-based authority next to content quality).

Power iteration as pure DataFrame algebra: each round is one
out-degree-normalized contribution explode (a join on src) and one
sum-by-dst, with the dangling-node mass (pages with no outlinks)
redistributed uniformly so the ranks keep summing to 1 — the standard
formulation. Iterations end in ``localCheckpoint`` so the lineage
does not grow with the round count (same discipline as
operators/components.py; swap for a reliable ``checkpoint`` dir on a
real cluster).

Scale shape: the edge relation shuffles on src once per round (join
against the current ranks) and the contributions shuffle on dst once
per round — 2 exchanges × iterations, each O(edges). Ranks are one
row per node; nothing corpus-sized ever reaches the driver (the
dangling-mass term is a one-row aggregate per round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 20,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Rank every node of the directed graph ``edges``: returns
    ``(node, rank)`` with ranks summing to 1 (damped power iteration,
    uniform teleport, dangling mass redistributed uniformly).

    Deterministic: the result is a pure function of the edge SET (
    duplicate edges are collapsed — a page linking the same target
    twice is one endorsement, the convention host-graph builders use).
    Nodes appearing only as targets (no outlinks) are ranked too;
    their whole rank is dangling mass."""
    if iterations < 1:
        raise ValueError(f"pagerank: iterations must be >= 1, got {iterations}")
    if not (0.0 < damping < 1.0):
        raise ValueError(f"pagerank: damping must be in (0, 1), got {damping}")
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    # out-degree-normalized edge weights, fixed across iterations
    out = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    w = (
        e.join(out, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("__deg")).alias("__w"))
        .localCheckpoint(eager=True)
    )
    teleport = (1.0 - damping) / n_nodes
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    for _ in range(iterations):
        contribs = (
            w.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("__w")).alias("__in"))
        )
        # dangling mass: rank held by nodes with no outlinks — spread
        # uniformly (one scalar per round, a bounded driver value)
        dangling = (
            ranks.join(out.withColumnRenamed("src", "node"), "node", "left_anti")
            .agg(F.sum("rank"))
            .first()[0]
            or 0.0
        )
        spread = damping * dangling / n_nodes
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.lit(damping) * F.coalesce(F.col("__in"), F.lit(0.0))
                    + F.lit(spread)
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
