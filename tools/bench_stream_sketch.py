"""Per-tick cost of the streaming sketch state as history grows —
the measurement behind the round-5 partitioning fix.

stream_token_sketch keys each batch's cells to their own date
partition (batch_ds in the PK), so the warehouse upsert stages and
renames ONE depth x width partition per tick. The pre-fix shape (no
partition source) takes upsert's whole-table path: read + anti-join +
rewrite of every stored batch, O(n_batches) per tick. This harness
drives the exact handler write path (batch_token_sketch + upsert) for
B ticks under both specs and reports the per-tick trend; done right,
the partitioned curve is flat and the whole-table curve grows
linearly.

Usage: python tools/bench_stream_sketch.py [--batches 40] [--probe 5]

Emits one JSON line:
{"ticks": B, "cells_per_batch": n,
 "sec_first": {"partitioned": s, "whole_table": s},
 "sec_last":  {"partitioned": s, "whole_table": s},
 "growth":    {"partitioned": x, "whole_table": x}}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import types as T

from binancedatapipeline_spark.catalog import TableSpec
from binancedatapipeline_spark.session import get_session
from binancedatapipeline_spark.streaming.jobs import batch_token_sketch
from binancedatapipeline_spark.warehouse import Warehouse

FIELDS = [
    T.StructField("batch_ds", T.DateType()),
    T.StructField("batch_id", T.LongType()),
    T.StructField("row", T.IntegerType()),
    T.StructField("bucket", T.LongType()),
    T.StructField("cnt", T.LongType()),
    T.StructField("depth", T.IntegerType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("stream_id", T.StringType()),
]


def spec(name: str, partitioned: bool) -> TableSpec:
    return TableSpec(
        name=name,
        primary_keys=("batch_ds", "batch_id", "row", "bucket"),
        schema=T.StructType(FIELDS),
        kind="fact",
        partition_date_source="batch_ds" if partitioned else None,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=40)
    ap.add_argument("--probe", type=int, default=5, help="ticks averaged at each end")
    ap.add_argument("--docs-per-batch", type=int, default=2000)
    args = ap.parse_args()

    spark = get_session(app_name="bench_stream_sketch")
    root = tempfile.mkdtemp(prefix="sketch_bench_")
    wh = Warehouse(spark, root)

    def batch_docs(b: int):
        ids = spark.range(0, args.docs_per_batch, 1, 8)
        text = F.concat_ws(
            " ",
            F.expr(
                f"transform(sequence(1, 40), "
                f"j -> concat('w', pmod(xxhash64(id + {b} * 1000000, j), 50021)))"
            ),
        )
        return ids.select(F.col("id").alias("doc_id"), text.alias("text"))

    out: dict[str, dict[str, float]] = {"sec_first": {}, "sec_last": {}, "growth": {}}
    cells = None
    for mode, part in (("partitioned", True), ("whole_table", False)):
        sp = spec(f"sk_{mode}", part)
        ticks = []
        for b in range(args.batches):
            sk = batch_token_sketch(batch_docs(b), b, "bench-stream")
            t0 = time.perf_counter()
            wh.upsert(sp, sk)
            ticks.append(time.perf_counter() - t0)
            if b % 10 == 0:
                print(f"  {mode} tick {b}: {ticks[-1]:.2f}s", file=sys.stderr, flush=True)
        if cells is None:
            cells = wh.read(sp).filter(F.col("batch_id") == 0).count()
        first = sum(ticks[: args.probe]) / args.probe
        last = sum(ticks[-args.probe :]) / args.probe
        out["sec_first"][mode] = round(first, 3)
        out["sec_last"][mode] = round(last, 3)
        out["growth"][mode] = round(last / first, 2)
    print(
        json.dumps(
            {"ticks": args.batches, "cells_per_batch": cells, **out}
        )
    )


if __name__ == "__main__":
    main()
