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
per round — 2 edge-sized exchanges × iterations. Everything else in
the loop is NODE-sized: the dangling node set (pages with no
outlinks) is invariant across iterations, so it is precomputed once
and checkpointed, and the per-round dangling-mass term is a semi-join
of the current ranks against it plus a one-row sum — no edge lineage
is ever re-evaluated inside the loop (the round-8 form re-derived the
out-degree relation from raw edges every round: one extra full
edge-distinct shuffle + aggregation per iteration). Ranks are one row
per node; nothing corpus-sized ever reaches the driver.
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
    seeds: DataFrame | list | None = None,
    tol: float | None = None,
) -> DataFrame:
    """Rank every node of the directed graph ``edges``: returns
    ``(node, rank)`` with ranks summing to 1 (damped power iteration,
    uniform teleport, dangling mass redistributed like the teleport).

    ``seeds`` switches to PERSONALIZED PageRank (TrustRank): the
    teleport vector — and the dangling mass — concentrates on the
    seed set instead of all nodes, so a node's rank measures its link
    proximity to the trusted seeds (the curation use: seed Wikipedia/
    gov/edu hosts, weight crawl hosts by how reachable they are from
    trust). Seeds may be a one-column DataFrame or a Python list;
    seeds absent from the graph are ignored, and at least one seed
    must be present.

    ``tol`` enables early stopping: iteration ends once the L∞ rank
    change falls below it (``iterations`` becomes the cap). The check
    is one node-sized aggregate per round next to the dangling-mass
    aggregate the loop already runs — convergence detection costs a
    second bounded scalar, not a corpus pass.

    Deterministic: the result is a pure function of the edge SET
    (duplicate edges are collapsed — a page linking the same target
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

    # the teleport distribution: uniform over all nodes, or uniform
    # over the seed set (personalized). `__t` sums to 1 either way.
    if seeds is not None:
        if not isinstance(seeds, DataFrame):
            spark = edges.sparkSession
            seeds = spark.createDataFrame(
                [(s,) for s in seeds], nodes.select("node").schema
            )
        seed_nodes = (
            nodes.join(
                seeds.select(F.col(seeds.columns[0]).alias("node")).distinct(),
                "node",
                "left_semi",
            ).localCheckpoint(eager=True)
        )
        n_seeds = seed_nodes.count()
        if n_seeds == 0:
            raise ValueError("pagerank: no seed appears in the graph")
        tvec = nodes.join(
            seed_nodes.withColumn("__t", F.lit(1.0 / n_seeds)), "node", "left"
        ).select("node", F.coalesce("__t", F.lit(0.0)).alias("__t"))
    else:
        tvec = nodes.withColumn("__t", F.lit(1.0 / n_nodes))
    tvec = tvec.localCheckpoint(eager=True)

    # out-degree-normalized edge weights, fixed across iterations
    out = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    w = (
        e.join(out, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("__deg")).alias("__w"))
        .localCheckpoint(eager=True)
    )
    # the dangling node SET (no outlinks) is invariant across
    # iterations: precompute + checkpoint it once, so the per-round
    # dangling-mass term is node-sized work (semi-join + sum) and no
    # edge lineage is ever evaluated inside the loop
    dangling_nodes = nodes.join(
        w.select(F.col("src").alias("node")).distinct(), "node", "left_anti"
    ).localCheckpoint(eager=True)
    ranks = tvec.select("node", F.col("__t").alias("rank"))
    for _ in range(iterations):
        contribs = (
            w.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("__w")).alias("__in"))
        )
        # dangling mass: rank held by nodes with no outlinks — spread
        # along the teleport vector (one scalar per round, a bounded
        # driver value)
        dangling = (
            ranks.join(dangling_nodes, "node", "left_semi")
            .agg(F.sum("rank"))
            .first()[0]
            or 0.0
        )
        nxt = (
            tvec.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.col("__t") * F.lit((1.0 - damping) + damping * dangling)
                    + F.lit(damping) * F.coalesce(F.col("__in"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        if tol is not None:
            delta = (
                nxt.join(
                    ranks.withColumnRenamed("rank", "__prev"), "node", "left"
                )
                .agg(F.max(F.abs(F.col("rank") - F.coalesce("__prev", F.lit(0.0)))))
                .first()[0]
            )
            ranks = nxt
            if delta is not None and delta < tol:
                break
        else:
            ranks = nxt
    return ranks
