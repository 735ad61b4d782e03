"""Scaling evidence for incremental LSH dedup (textops/dedup.py
band_index / incremental_near_dedup): the cost of deduplicating a
fixed-size ingest batch must stay ~flat as the stored corpus history
grows — the batch probes the index with one equi-join and history is
never re-signed.

Protocol: history of H docs (H swept), fixed batch of B new docs (~6%
of which near-dup history docs). For each H measure (a) building the
batch's own signatures + probing the stored index + the survivor
anti-join (the per-ingest cost), and (b) the full-recompute
alternative (lsh pairs over history+batch) — the naive engine's
per-ingest cost. Index build time is reported separately (paid once,
amortized across every future batch).

Round-robin repeats with per-op min, like every harness here (the
host shows multi-minute co-tenant bursts).

Emits one JSON line:
  {"history": [...], "batch": B,
   "sec": {"incremental": {H: s}, "full_recompute": {H: s},
           "index_build": {H: s}},
   "flat_ratio": r}   # incremental(Hmax)/incremental(Hmin); ~1 = flat
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from binancedatapipeline_spark.session import get_session
from binancedatapipeline_spark.textops.dedup import (
    band_index,
    incremental_near_dedup,
    lsh_candidate_pairs,
)
from tools.bench_textops import gen_corpus


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--history", default="25000,100000,400000")
    ap.add_argument("--batch", type=int, default=5000)
    args = ap.parse_args()
    sizes = [int(s) for s in args.history.split(",")]
    B = args.batch

    spark = get_session(app_name="bench_incr_dedup")
    sec: dict[str, dict[str, float]] = {"incremental": {}, "full_recompute": {}, "index_build": {}}
    survivors: dict[str, int] = {}
    reps = max(int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")), 1)

    for H in sizes:
        # history = ids [0, H); batch = mostly-novel ids [H, H+B)
        # (text derives from the actual id, so novel batch docs share
        # no content with history) with every 17th batch doc REPLACED
        # by an exact copy of a spread-out history doc — the ~6%
        # cross-history duplicate load a real ingest carries. (An
        # earlier version shifted ids after generation, which made the
        # batch 100% history copies and the survivor path a no-op.)
        hist = gen_corpus(spark, H).persist()
        hist.count()
        novel = gen_corpus(spark, B, start=H)
        dup_map = novel.filter(F.col("doc_id") % 17 == 0).select(
            "doc_id", (F.col("doc_id") * 31 % H).alias("__src")
        )
        dups = dup_map.join(
            hist.select(F.col("doc_id").alias("__src"), F.col("text").alias("__t")),
            "__src",
        ).select("doc_id", F.col("__t").alias("text"))
        batch = (
            novel.join(dups.select("doc_id"), "doc_id", "left_anti")
            .unionByName(dups)
            .persist()
        )
        batch.count()
        idx = None

        samples: dict[str, list[float]] = {k: [] for k in sec}
        for _ in range(reps):
            t0 = time.perf_counter()
            idx_new = band_index(hist, k=16, bands=8).persist()
            idx_new.count()
            samples["index_build"].append(time.perf_counter() - t0)
            if idx is not None:
                idx.unpersist()
            idx = idx_new

            t0 = time.perf_counter()
            kept, _ = incremental_near_dedup(batch, idx, k=16, bands=8)
            kept.write.format("noop").mode("overwrite").save()
            samples["incremental"].append(time.perf_counter() - t0)

            t0 = time.perf_counter()
            lsh_candidate_pairs(hist.unionByName(batch), k=16, bands=8).write.format(
                "noop"
            ).mode("overwrite").save()
            samples["full_recompute"].append(time.perf_counter() - t0)
        for k, runs in samples.items():
            sec[k][str(H)] = round(min(runs), 2)
        # workload honesty check (untimed): survivors must be the
        # ~94% novel fraction, proving the probe does real filtering
        # work rather than running on a degenerate all-dup batch
        kept, _ = incremental_near_dedup(batch, idx, k=16, bands=8)
        survivors[str(H)] = kept.count()
        hist.unpersist()
        batch.unpersist()
        if idx is not None:
            idx.unpersist()

    lo, hi = str(min(sizes)), str(max(sizes))
    out = {
        "history": sizes,
        "batch": B,
        "sec": sec,
        "survivors": survivors,
        # incremental cost growth across the max/min history-size
        # ratio; ~1.0 means the per-ingest cost is flat in history
        "flat_ratio": round(
            sec["incremental"][hi] / max(sec["incremental"][lo], 1e-9), 2
        ),
        "speedup_at_max": round(
            sec["full_recompute"][hi] / max(sec["incremental"][hi], 1e-9), 1
        ),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
