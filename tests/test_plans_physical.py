"""Physical-plan property guards: the optimizations the engine's
scale story depends on must be visible in the executed plans —
pushdown reaching the scan, broadcast joins for dims, TakeOrdered for
top-k. Catching a regression here is catching a 100 TB incident at
sf0.001 cost."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"


def _final_plan(df) -> str:
    df.collect()  # execute THIS plan so AQE finalizes it
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    # formatted mode prints scan details (PushedFilters, ReadSchema)
    # untruncated, unlike executedPlan().toString()
    return qe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_filter_pushdown_reaches_scan(spark):
    df = entry_mod.queries()["filtered_projection"](spark, SF)
    plan = _final_plan(df)
    assert "PushedFilters: [" in plan
    # the IN-list and range predicates must be in the scan, not a Filter above it
    assert "In(l_returnflag" in plan, plan
    assert "GreaterThan(l_quantity,25.0)" in plan, plan


def test_column_pruning_reaches_scan(spark):
    df = entry_mod.queries()["pricing_summary"](spark, SF)
    plan = _final_plan(df)
    # lineitem has 16 columns; the scan must read only the 6 used
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_comment" not in read_schema
    assert read_schema.count(":") <= 8, read_schema


def test_dim_joins_broadcast(spark):
    df = entry_mod.queries()["join_dims_broadcast"](spark, SF)
    plan = _final_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_topk_uses_take_ordered(spark):
    # q_topk_orders is driven directly (not registry-listed: the
    # driver window is pinned at 50 and ordered top-k is verified via
    # topk_per_group) — the global sort+limit must still plan as a
    # TakeOrderedAndProject, never a full sort.
    df = entry_mod.q_topk_orders(spark, SF)
    plan = _final_plan(df)
    assert "TakeOrderedAndProject" in plan, plan


def test_decontaminate_broadcasts_benchmark(spark):
    """The benchmark shingle set must be the broadcast side — the
    corpus side stays a map + broadcast probe with no corpus-keyed
    shuffle before the hit count (the 100 TB contract)."""
    df = entry_mod.queries()["doc_decontaminate"](spark, SF)
    plan = _final_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_no_cartesian_products_anywhere(spark):
    """No query may plan a cartesian/nested-loop join except the
    explicitly-blocked similarity scans (which bound one side)."""
    # query-vector broadcast cross joins by design: the bounded (3-row)
    # query set is the broadcast side in both the float and the
    # SQ8-decoded scan
    allowed = {"emb_cosine_topk", "sq8_topk"}
    for name, fn in entry_mod.queries().items():
        df = fn(spark, SF)
        plan = df._jdf.queryExecution().sparkPlan().toString()
        if name in allowed:
            continue
        assert "CartesianProduct" not in plan, f"{name}: cartesian product\n{plan}"


def test_ngram_jaccard_reuses_shingle_exchange(spark):
    """The self-join's two sides are one subplan: the shingle
    explode must be computed once, the second side served from a
    ReusedExchange (the 100 TB guarantee that the corpus is
    tokenized exactly once). The singleton prune IS a Window on
    sh_hash — it rides the exchange the join pays anyway and drops
    ~94% of rows before the merge; measured faster than no-prune at
    5k-50k docs and within noise at 250k (tools/bench_ngram_prune.py
    — the round-3 no-prune argument was tested and lost)."""
    df = entry_mod.queries()["doc_ngram_jaccard"](spark, SF)
    plan = _final_plan(df)
    assert "ReusedExchange" in plan, plan
    assert "Window" in plan, plan


def test_join_composite_key_scans_events_once(spark):
    """Both join sides derive from one scan+aggregate; the per-side
    filter tests the aggregated etype=max(event_type) (NOT the
    grouping column, which Catalyst would push below the agg and into
    the scan, forking the subplans into two full scans). AQE must
    serve the second side from a ReusedExchange at runtime."""
    df = entry_mod.queries()["join_composite_key"](spark, SF)
    plan = _final_plan(df)
    assert "ReusedExchange" in plan, plan


def test_count_distinct_never_materializes_sets(spark):
    """Round 12: the query is the single two-countDistinct aggregate —
    Spark plans it as Expand (gid-tagged row duplication, map-side
    CPU only) + partial distinct HashAggregates that compress
    duplicates BEFORE the one exchange. That map-side reduction is
    why it beat the round-7 repartition-first branch-join 1.8x at sf1
    (the repartition shipped every raw row). What stays banned is
    per-group value-set materialization: never ObjectHashAggregate /
    collect_set (a hot-key OOM at 100 TB), never a join fork."""
    df = entry_mod.queries()["count_distinct"](spark, SF)
    plan = _final_plan(df)
    assert "Expand" in plan, plan  # the two-gid distinct aggregate
    assert "ObjectHashAggregate" not in plan, plan
    assert "collect_set" not in plan, plan
    assert "HashAggregate" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Join" not in plan, plan  # single aggregate, no branch fork


def test_lsh_topk_is_index_probe_not_scan(spark):
    """Multi-probe LSH must candidate-generate via a hash equi-join on
    the bucket id — not a nested-loop evaluating every corpus×query
    Hamming distance."""
    from binancedatapipeline_spark.similarity import lsh_bucketed_topk

    emb = entry_mod._t(spark, SF, "embeddings")
    queries = emb.limit(2).select(
        entry_mod.F.col("vec_id").alias("query_id"),
        entry_mod.F.col("embedding").alias("query_vec"),
    )
    df = lsh_bucketed_topk(emb, queries, k=5, max_hamming=2)
    plan = _final_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_spread_is_noop_when_wide_enough(spark):
    """spread() must not add a shuffle when the input already meets
    the target parallelism — the at-scale no-op contract."""
    from binancedatapipeline_spark.operators.spread import spread

    wide = spark.range(0, 1000, 1, 64)
    assert spread(wide) is wide
    narrow = spark.range(0, 1000, 1, 1)
    out = spread(narrow)
    assert out.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism
