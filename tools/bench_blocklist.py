"""Reproduces FLAGSHIP "domain blocklist" curves: wall time vs
blocklist size (broadcast construction axis) and vs corpus size (the
flat map-stage axis).

Usage: python tools/bench_blocklist.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from binancedatapipeline_spark.session import get_session
from binancedatapipeline_spark.textops.corpus_io import with_blocked_domain


def _blocklist(spark, n: int):
    # realistic shape: a mix of 2- and 3-label entries
    return spark.range(n).select(
        F.when(
            F.col("id") % 4 == 0,
            F.concat(
                F.lit("s"), F.col("id").cast("string"),
                F.lit(".dom"), (F.col("id") % 50_000).cast("string"),
                F.lit(".com"),
            ),
        )
        .otherwise(
            F.concat(F.lit("dom"), F.col("id").cast("string"), F.lit(".net"))
        )
        .alias("domain")
    )


def _corpus(spark, n: int):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("https://w"), (F.col("id") % 7).cast("string"),
            F.lit(".dom"), (F.col("id") % 1_000_000).cast("string"),
            F.when(F.col("id") % 2 == 0, F.lit(".net")).otherwise(F.lit(".com")),
            F.lit("/p/"), F.col("id").cast("string"),
        ).alias("url"),
    )


def main() -> None:
    spark = get_session(app_name="bench_blocklist")
    # warmup (session/codegen cost must not land on the first row)
    with_blocked_domain(_corpus(spark, 10_000), _blocklist(spark, 1_000)).filter(
        "blocked_domain is not null"
    ).count()

    for n_list in (10_000, 1_000_000, 4_000_000):
        bl, docs = _blocklist(spark, n_list), _corpus(spark, 1_000_000)
        t0 = time.perf_counter()
        n = with_blocked_domain(docs, bl).filter("blocked_domain is not null").count()
        print(f"list={n_list:>9,} corpus=1,000,000  {time.perf_counter()-t0:6.2f}s  blocked={n:,}")

    bl = _blocklist(spark, 1_000_000)
    for n_docs in (250_000, 1_000_000, 4_000_000):
        docs = _corpus(spark, n_docs)
        t0 = time.perf_counter()
        n = with_blocked_domain(docs, bl).filter("blocked_domain is not null").count()
        print(f"list=1,000,000 corpus={n_docs:>9,}  {time.perf_counter()-t0:6.2f}s  blocked={n:,}")

    # the beyond-broadcast escape hatch (broadcast=False): a 20M-entry
    # merged multi-category list against a 1M-doc corpus, vs the
    # broadcast path at the same size where it still fits
    for n_list, mode in ((4_000_000, False), (20_000_000, False)):
        bl, docs = _blocklist(spark, n_list), _corpus(spark, 1_000_000)
        t0 = time.perf_counter()
        n = (
            with_blocked_domain(docs, bl, broadcast=mode)
            .filter("blocked_domain is not null")
            .count()
        )
        print(
            f"list={n_list:>10,} corpus=1,000,000 broadcast={mode}  "
            f"{time.perf_counter()-t0:6.2f}s  blocked={n:,}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
