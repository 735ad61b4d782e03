"""Round-12 in-process paired A/B: count_distinct plan variants and
tfidf df-attach modes, timed with the bench methodology (noop sink,
interleaved round-robin passes, per-pass host-calibration probes) in
ONE process so host drift between variants is visible, not silent.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata_big/sf1 python tools/bench_r12_variants.py [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import bench as bench_mod
from binancedatapipeline_spark.session import get_session


def cd_current(spark, sf_dir):
    """C1: repartition(suppkey) first, two exchange-free distinct
    branches, key-local join (the r7 form, today's registry plan)."""
    import __spark_entry__ as e

    return e.q_count_distinct(spark, sf_dir)


def cd_branch_join(spark, sf_dir):
    """C3: no up-front repartition — each branch pays its own
    (suppkey, value) distinct exchange WITH map-side partial distinct,
    then a suppkey exchange for the count; join reuses partitioning."""
    import __spark_entry__ as e

    li = e._t(spark, sf_dir, "lineitem")
    d = li.select("l_suppkey", "l_partkey", "l_orderkey")
    parts = (
        d.select("l_suppkey", "l_partkey")
        .distinct()
        .groupBy("l_suppkey")
        .agg(F.count("l_partkey").alias("n_parts"))
    )
    orders = (
        d.select("l_suppkey", "l_orderkey")
        .distinct()
        .groupBy("l_suppkey")
        .agg(F.count("l_orderkey").alias("n_orders"))
    )
    return parts.join(orders, "l_suppkey")


def cd_expand(spark, sf_dir):
    """C2: the single two-countDistinct aggregate (Expand doubles the
    scan rows; rejected at sf0.1 in rounds 5/7 — re-measured at sf1
    per VERDICT item 6)."""
    import __spark_entry__ as e

    li = e._t(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


def cd_repart_expand(spark, sf_dir):
    """C4: repartition(suppkey) then the two-countDistinct aggregate —
    Expand happens post-shuffle, the aggregate is exchange-free."""
    import __spark_entry__ as e

    li = e._t(spark, sf_dir, "lineitem")
    return (
        li.select("l_suppkey", "l_partkey", "l_orderkey")
        .repartition(F.col("l_suppkey"))
        .groupBy("l_suppkey")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
    )


def tfidf_window(spark, sf_dir):
    import __spark_entry__ as e
    from binancedatapipeline_spark.textops.analysis import tfidf_top_terms

    d = e._t(spark, sf_dir, "documents")
    out = tfidf_top_terms(d, k=3, df_mode="window")
    return out.select(
        "doc_id", "term", "tf", e._r6("tfidf").alias("tfidf"), "term_rank"
    )


def tfidf_broadcast(spark, sf_dir):
    import __spark_entry__ as e
    from binancedatapipeline_spark.textops.analysis import tfidf_top_terms

    d = e._t(spark, sf_dir, "documents")
    out = tfidf_top_terms(d, k=3, df_mode="broadcast")
    return out.select(
        "doc_id", "term", "tf", e._r6("tfidf").alias("tfidf"), "term_rank"
    )


VARIANTS = {
    "cd_current": cd_current,
    "cd_branch_join": cd_branch_join,
    "cd_expand": cd_expand,
    "cd_repart_expand": cd_repart_expand,
    "tfidf_window": tfidf_window,
    "tfidf_broadcast": tfidf_broadcast,
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata_big/sf1")
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    only = os.environ.get("SPARK_GRAFT_VARIANTS")
    variants = dict(VARIANTS)
    if only:
        keep = {s.strip() for s in only.split(",")}
        variants = {k: v for k, v in variants.items() if k in keep}
    spark = get_session(app_name="bench_r12_variants")
    for name, fn in variants.items():  # warm-up (JIT/codegen exclusion)
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    samples: dict[str, list[float]] = {n: [] for n in variants}
    calib = []
    for _ in range(repeats):
        calib.append(bench_mod.host_calibration(repeats=1))
        for name, fn in variants.items():
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"r12 variant: {name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[name].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
    out = {
        "sf_dir": sf_dir,
        "repeats": repeats,
        "host_calibration_per_pass": [round(c, 4) for c in calib],
        "best": {n: round(min(s), 4) for n, s in samples.items()},
        "median": {
            n: round(sorted(s)[len(s) // 2], 4) for n, s in samples.items()
        },
        "all": {n: [round(v, 4) for v in s] for n, s in samples.items()},
    }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
